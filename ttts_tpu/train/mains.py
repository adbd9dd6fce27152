"""Per-model training entry points.

CLI parity with the reference trainers:
  python -m ttts_tpu.train.mains gpt        --config cfg.json --manifest data.jsonl
  python -m ttts_tpu.train.mains diffusion  --config cfg.yaml --manifest data.jsonl --gpt-ckpt dir
  python -m ttts_tpu.train.mains vqvae      --config cfg.json --manifest data.jsonl
  python -m ttts_tpu.train.mains clvp       --config cfg.json --manifest data.jsonl
  python -m ttts_tpu.train.mains classifier --config cfg.json --clean c.txt --noise n.txt

(reference: `accelerate launch ttts/{gpt,diffusion,clvp,classifier}/train.py`
and `python ttts/vqvae/train.py` — here there is no launcher: one process
drives the whole mesh via jit/GSPMD.)
"""

from __future__ import annotations

import argparse
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.config import TTTSConfig, default_config, load_config
from ttts_tpu.data.datasets import (
    CLVPDataset,
    DiffusionDataset,
    GptTtsDataset,
    PreprocessedMelDataset,
    VQGANDataset,
)
from ttts_tpu.data.loader import DataLoader, EpochLoader
from ttts_tpu.data.sampler import DistributedBucketSampler
from ttts_tpu.parallel import make_mesh
from ttts_tpu.train.state import TrainState, make_adamw, make_gan_adam, with_accumulation
from ttts_tpu.train.steps import (
    clvp_train_step,
    diffusion_train_step,
    gpt_train_step,
    vqvae_train_step,
)
from ttts_tpu.train.trainer import Trainer


def _amp_dtype(cfg: TTTSConfig):
    """Activation dtype for models with AMP plumbing (reference: accelerate
    fp16 AMP, gpt/train.py:30). bf16 on accelerators, f32 on CPU — the 4×
    MXU rate is the point; CPU runs (tests, parity studies) stay exact."""
    if cfg.train.amp and jax.default_backend() not in ("cpu",):
        return jnp.bfloat16
    return jnp.float32


def _cadence(cfg: TTTSConfig):
    """Trainer cadences in MICRO-steps. With optax.MultiSteps accumulation
    the jitted step runs once per micro-batch, so train_steps/save_freq/
    log_every (which the config states in OPTIMIZER updates, reference
    semantics gpt/train.py:99-136) must all be scaled by accumulate_num —
    otherwise checkpoint numbering and log cadence silently switch units."""
    m = max(cfg.train.accumulate_num, 1)
    return (cfg.train.train_steps * m, cfg.train.save_freq * m, 100 * m)


def _dist_info():
    """(rank, world) for the data pipeline. Multi-host runs (--multihost /
    TTTS_MULTIHOST=1 / WORLD_SIZE>1 — the reference's env:// convention,
    ttts/vqvae/train.py:50-51) bootstrap jax.distributed first so the mesh
    spans every process; each process then loads only its rank-strided
    sampler shard and the Trainer assembles global arrays from process-local
    data. Single-host runs return (0, 1) without touching the distributed
    service."""
    from ttts_tpu.parallel import initialize_distributed, multihost_requested

    if multihost_requested():
        return initialize_distributed()
    return 0, 1


def _per_process_batch(global_batch: int, world: int) -> int:
    assert global_batch % world == 0, (
        f"global batch {global_batch} must divide over {world} processes")
    return global_batch // world


def _simple_batches(dataset, batch_size: int, seed: int,
                    num_replicas: int = 1, rank: int = 0):
    """Shuffled index batches, re-seeded per epoch; rank-strided across
    processes (every process computes the same permutation from the shared
    seed, then takes batches[rank::num_replicas])."""

    def make(epoch: int):
        g = np.random.default_rng(seed + epoch)
        order = g.permutation(len(dataset))
        batches = [
            list(order[i : i + batch_size])
            for i in range(0, len(order) - batch_size + 1, batch_size)
        ]
        n = (len(batches) // num_replicas) * num_replicas
        batches = batches[:n][rank::num_replicas]
        return DataLoader(dataset, batches, dataset.collate)

    return EpochLoader(make)


def _bucketed_batches(dataset, batch_size: int, seed: int, boundaries,
                      num_replicas: int = 1, rank: int = 0):
    """Length-bucketed shuffled batches via DistributedBucketSampler —
    batches are length-homogeneous, so (a) padding waste is bounded by the
    bucket width and (b) the set of padded shapes — hence jit compiles — is
    bounded by the bucket count instead of growing with the length
    distribution. Lengths come from a header-only sidecar scan
    (`dataset.lengths()`); rows with missing sidecars (length -1) fall
    outside every bucket and are dropped, matching __getitem__'s None.
    Falls back to _simple_batches when nothing lands in a bucket (e.g. a
    corpus with no sidecars yet — those rows would fail later anyway, with
    a clearer error at collate time)."""
    lengths = dataset.lengths()
    sampler = DistributedBucketSampler(lengths, batch_size, list(boundaries),
                                       num_replicas=num_replicas, rank=rank,
                                       seed=seed)
    if not sampler.buckets:
        return _simple_batches(dataset, batch_size, seed,
                               num_replicas=num_replicas, rank=rank)

    def make(epoch: int):
        sampler.set_epoch(epoch)
        return DataLoader(dataset, list(iter(sampler)), dataset.collate)

    return EpochLoader(make)


def train_gpt(cfg: TTTSConfig, manifest: str, logs_folder: Optional[str] = None):
    model_cfg = cfg.gpt
    from ttts_tpu.models.gpt import UnifiedVoice

    model = UnifiedVoice(model_cfg, dtype=_amp_dtype(cfg))
    ds = GptTtsDataset(manifest)
    rank, world = _dist_info()
    # length-bucketed over VQ-code counts (the dominant padded axis);
    # MAX_CODES=600 so buckets of 64 up to 640 cover every kept row
    data = _bucketed_batches(ds, _per_process_batch(cfg.train.batch_size, world),
                             cfg.train.seed, boundaries=range(0, 641, 64),
                             num_replicas=world, rank=rank)

    ex = None
    for i in range(len(ds)):
        ex = ds[i]
        if ex is not None:
            break
    assert ex is not None, "no usable examples in manifest"
    batch0 = ds.collate([ex])
    params = model.init(
        jax.random.key(cfg.train.seed),
        jnp.asarray(batch0["text"]), jnp.asarray(batch0["text_lengths"]),
        jnp.asarray(batch0["mel_codes"]), jnp.asarray(batch0["wav_lengths"]),
    )
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=with_accumulation(
            make_adamw(cfg.train.lr, cfg.train.warmup_steps, cfg.train.betas,
                       cfg.train.weight_decay, cfg.train.grad_clip),
            cfg.train.accumulate_num),
        ema_params=params,  # de-aliased by TrainState.create (donation)
    )
    # donate the state: aliases params/opt buffers into the step's outputs,
    # halving steady-state HBM (the old state is never read again — the
    # non-finite skip keeps it in-jit, and Orbax async saves copy to host
    # before returning)
    step = jax.jit(
        functools.partial(gpt_train_step, model=model,
                          text_weight=cfg.train.text_weight,
                          mel_weight=cfg.train.mel_weight),
        donate_argnums=(0,),
    )
    train_steps, save_freq, log_every = _cadence(cfg)
    trainer = Trainer(
        lambda s, b, k: step(s, b, k), state, data,
        logs_folder or cfg.train.logs_folder,
        train_steps, save_freq, cfg.train.keep_ckpts, log_every=log_every,
        mesh=make_mesh(cfg.mesh),
    )
    trainer.maybe_resume()
    return trainer.train()


def train_clvp(cfg: TTTSConfig, manifest: str, logs_folder: Optional[str] = None):
    from ttts_tpu.models.clvp import CLVP

    model = CLVP(cfg.clvp, dtype=_amp_dtype(cfg))
    ds = CLVPDataset(manifest)
    rank, world = _dist_info()
    data = _bucketed_batches(ds, _per_process_batch(cfg.train.batch_size, world),
                             cfg.train.seed, boundaries=range(0, 641, 64),
                             num_replicas=world, rank=rank)
    ex = next(e for e in (ds[i] for i in range(len(ds))) if e is not None)
    b0 = ds.collate([ex])
    params = model.init(jax.random.key(0), jnp.asarray(b0["text"]),
                        jnp.asarray(b0["speech_tokens"]))
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=with_accumulation(make_adamw(cfg.train.lr, cfg.train.warmup_steps),
                             cfg.train.accumulate_num))
    step = jax.jit(functools.partial(clvp_train_step, model=model),
                   donate_argnums=(0,))
    train_steps, save_freq, log_every = _cadence(cfg)
    trainer = Trainer(lambda s, b, k: step(s, b, k), state, data,
                      logs_folder or cfg.train.logs_folder,
                      train_steps, save_freq, cfg.train.keep_ckpts,
                      log_every=log_every, mesh=make_mesh(cfg.mesh))
    trainer.maybe_resume()
    return trainer.train()


def train_diffusion(cfg: TTTSConfig, manifest: str, gpt_params,
                    logs_folder: Optional[str] = None):
    from ttts_tpu.diffusion.gaussian import GaussianDiffusion, get_named_beta_schedule
    from ttts_tpu.models.diffusion_net import AA_diffusion
    from ttts_tpu.models.gpt import UnifiedVoice

    gpt_model = UnifiedVoice(cfg.gpt, dtype=_amp_dtype(cfg))
    net = AA_diffusion(cfg.diffusion_net, dtype=_amp_dtype(cfg))
    diffuser = GaussianDiffusion(
        betas=get_named_beta_schedule(cfg.diffusion.noise_schedule,
                                      cfg.diffusion.trained_timesteps)
    )
    ds = DiffusionDataset(manifest)
    rank, world = _dist_info()
    # bucketed over target-mel frames (capped at MAX_MEL=400 like __getitem__)
    data = _bucketed_batches(ds, _per_process_batch(cfg.train.batch_size, world),
                             cfg.train.seed, boundaries=range(0, 449, 64),
                             num_replicas=world, rank=rank)
    ex = next(e for e in (ds[i] for i in range(len(ds))) if e is not None)
    b0 = ds.collate([ex])
    params = net.init(
        jax.random.key(0), jnp.asarray(b0["mel"]), jnp.asarray([1.0]),
        jnp.zeros((1, b0["mel_codes"].shape[1], cfg.gpt.model_dim)),
        jnp.asarray(b0["mel_refer"]),
    )
    state = TrainState.create(
        apply_fn=net.apply, params=params,
        tx=with_accumulation(make_adamw(cfg.train.lr, cfg.train.warmup_steps),
                             cfg.train.accumulate_num))
    step = jax.jit(
        functools.partial(
            diffusion_train_step, model=net, diffuser=diffuser,
            gpt_model=gpt_model, gpt_params=gpt_params,
            unconditioned_percentage=cfg.train.unconditioned_percentage,
        ),
        donate_argnums=(0,),
    )
    train_steps, save_freq, log_every = _cadence(cfg)
    trainer = Trainer(lambda s, b, k: step(s, b, k), state, data,
                      logs_folder or cfg.train.logs_folder,
                      train_steps, save_freq, cfg.train.keep_ckpts,
                      log_every=log_every, mesh=make_mesh(cfg.mesh))
    trainer.maybe_resume()
    return trainer.train()


def train_classifier(cfg: TTTSConfig, clean_list: str, noise_list: str,
                     logs_folder: Optional[str] = None):
    """Audio-quality classifier over clean/noise `.mel` sidecar lists
    (ttts/classifier/train.py:36-120: AdamW lr 3e-4 hardcoded at `:50`,
    betas (0.9, 0.9999), wd 0.01, clip 1.0, no warmup). Its checkpoints feed
    `prepare.misc classify` → noise_files.txt → `pipeline filter-noise`."""
    from ttts_tpu.models.classifier import AudioMiniEncoderWithClassifierHead
    from ttts_tpu.train.steps import classifier_train_step

    model = AudioMiniEncoderWithClassifierHead(cfg.classifier)
    ds = PreprocessedMelDataset(clean_list, noise_list,
                                pad_to=cfg.classifier.pad_to_mel_frames,
                                spec_dim=cfg.classifier.spec_dim,
                                rng=np.random.default_rng(cfg.train.seed))
    rank, world = _dist_info()
    data = _simple_batches(ds, _per_process_batch(cfg.train.batch_size, world),
                           cfg.train.seed, num_replicas=world, rank=rank)
    ex = next(e for e in (ds[i] for i in range(len(ds))) if e is not None)
    b0 = ds.collate([ex])
    params = model.init(jax.random.key(cfg.train.seed), jnp.asarray(b0["mel"]))
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=make_adamw(3e-4, warmup_steps=0, betas=(0.9, 0.9999),
                      weight_decay=0.01, grad_clip=1.0),
    )
    step = jax.jit(functools.partial(classifier_train_step, model=model),
                   donate_argnums=(0,))
    trainer = Trainer(lambda s, b, k: step(s, b, k), state, data,
                      logs_folder or cfg.train.logs_folder,
                      cfg.train.train_steps, cfg.train.save_freq,
                      cfg.train.keep_ckpts, mesh=make_mesh(cfg.mesh))
    trainer.maybe_resume()
    return trainer.train()


def make_vqvae_augment_cfg(cfg: TTTSConfig):
    from ttts_tpu.data.augment import AugmentConfig

    a = cfg.audio
    return AugmentConfig(
        sampling_rate=a.sampling_rate, win_length=a.win_length,
        hop_length=a.hop_length,
        formant_shift=cfg.train.formant_shift, pitch_shift=cfg.train.pitch_shift,
        pitch_range=cfg.train.pitch_range, q_min=cfg.train.q_min,
        q_max=cfg.train.q_max, num_peak=cfg.train.num_peak,
        g_min=cfg.train.g_min, g_max=cfg.train.g_max,
    )


def make_vqvae_loader(cfg: TTTSConfig, ds: VQGANDataset):
    """The codec GAN's host data path, exactly as training runs it: O(files)
    header-only length scan → DistributedBucketSampler → thread-pool
    DataLoader with the NANSY formant/pitch warp in the collate (the
    reference's praat stage, vqvae/train.py:62-116, moved host-side).
    Shared by train_vqvae and scripts/bench_loader.py so loader-throughput
    measurements exercise the real path."""
    from ttts_tpu.data.augment import warp_batch_np

    a = cfg.audio
    lengths = []
    for r in ds.rows:
        try:
            from ttts_tpu.data.audio import wav_frames

            lengths.append(wav_frames(r["path"], target_sr=a.sampling_rate))
        except Exception:
            lengths.append(0)

    aug_cfg = make_vqvae_augment_cfg(cfg)
    warp_rng = np.random.default_rng(cfg.train.seed + 17)

    def collate(items):
        b = ds.collate(items)
        if b is None:  # every clip dropped — trainer skips None batches
            return None
        if cfg.train.aug_warp and not cfg.train.aug_warp_device:
            # host-side NANSY formant/pitch warp (praat or numpy spectral
            # warp) in loader threads — only when the device warp is off;
            # the in-jit PEQ applies on top of it either way
            b = dict(b)
            b["wav_warped"] = warp_batch_np(
                warp_rng, np.asarray(b["wav"])[..., 0], aug_cfg
            )[..., None]
        return b

    def make(epoch: int):
        sampler = DistributedBucketSampler(
            lengths, cfg.train.batch_size,
            boundaries=[int(s * a.sampling_rate) for s in (0.65, 2, 4, 8, 16, 32, 54)],
            seed=cfg.train.seed,
        )
        sampler.set_epoch(epoch)
        return DataLoader(ds, list(sampler), collate)

    return EpochLoader(make)


def train_vqvae(cfg: TTTSConfig, manifest: str, logs_folder: Optional[str] = None):
    """GAN trainer: two states threaded through one step function. Checkpoints
    hold {'g': g_state, 'd': d_state} (the reference's G_/D_ pairs)."""
    from ttts_tpu.models.discriminator import MultiPeriodDiscriminator
    from ttts_tpu.models.vqvae import SynthesizerTrn
    from ttts_tpu.ops.mel import vits_spectrogram

    a = cfg.audio
    spec_ch = a.filter_length // 2 + 1
    gen = SynthesizerTrn(cfg.vqvae, spec_channels=spec_ch,
                         segment_frames=cfg.train.segment_size // a.hop_length)
    disc = MultiPeriodDiscriminator()
    ds = VQGANDataset(manifest, sample_rate=a.sampling_rate, hop_length=a.hop_length)
    aug_cfg = make_vqvae_augment_cfg(cfg)
    data = make_vqvae_loader(cfg, ds)

    it = iter(data)
    b0 = next(it)
    from ttts_tpu.ops.mel import vits_spectrogram as _vs
    spec0 = _vs(jnp.asarray(b0["wav"])[..., 0], a.filter_length, a.hop_length,
                a.win_length).swapaxes(1, 2)
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "slice": jax.random.key(2), "vq": jax.random.key(3)}
    g_vars = jax.jit(functools.partial(gen.init, train=True))(
        rngs, jnp.asarray(b0["wav"]), jnp.asarray(b0["wav"]),
        spec0, spec0, jnp.asarray(b0["spec_lengths"]), jnp.asarray(b0["text"]),
        jnp.asarray(b0["text_lengths"]))
    seg = jnp.zeros((1, cfg.train.segment_size, 1))
    d_params = disc.init(jax.random.key(4), seg, seg)["params"]
    g_state = TrainState.create(
        apply_fn=gen.apply, params=g_vars["params"],
        tx=make_gan_adam(cfg.train.lr, decay=cfg.train.lr_decay),
        extra_vars={"codebook": g_vars["codebook"]},
    )
    d_state = TrainState.create(apply_fn=disc.apply, params=d_params,
                                tx=make_gan_adam(cfg.train.lr, decay=cfg.train.lr_decay))

    step = jax.jit(
        functools.partial(vqvae_train_step, generator=gen, discriminator=disc,
                          audio_cfg=a, c_mel=cfg.train.c_mel, c_kl=cfg.train.c_kl,
                          augment_cfg=aug_cfg,
                          device_warp=cfg.train.aug_warp
                          and cfg.train.aug_warp_device),
        # donate BOTH states: the codec + MPD params/Adam moments are ~2 GB
        # in f32; without aliasing the alternating step holds two copies and
        # the documented batch-16 × 8 s config can exhaust HBM
        donate_argnums=(0, 1),
    )

    def paired_step(state, batch, key):
        g, d = state["g"], state["d"]
        g, d, metrics = step(g, d, batch, key)
        return {"g": g, "d": d}, metrics

    trainer = Trainer(paired_step, {"g": g_state, "d": d_state}, data,
                      logs_folder or cfg.train.logs_folder,
                      # NO accumulate_num multiplier here: the GAN optimizers
                      # are not MultiSteps-wrapped (alternating D/G
                      # accumulation is ill-defined, and the reference's
                      # codec trainer has no accumulation either —
                      # vqvae/train.py steps once per batch)
                      cfg.train.train_steps,
                      cfg.train.save_freq, cfg.train.keep_ckpts,
                      mesh=make_mesh(cfg.mesh))
    trainer.maybe_resume()
    return trainer.train()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model",
                   choices=["gpt", "diffusion", "vqvae", "clvp", "classifier"])
    p.add_argument("--config", default=None)
    p.add_argument("--manifest", default=None)
    p.add_argument("--logs", default=None)
    p.add_argument("--gpt-ckpt", default=None, help="frozen GPT checkpoint dir (diffusion)")
    p.add_argument("--clean", default=None, help="clean wav/dir list file (classifier)")
    p.add_argument("--noise", default=None, help="noise wav/dir list file (classifier)")
    args = p.parse_args(argv)
    if args.model == "classifier":
        assert args.clean and args.noise, "--clean and --noise required"
    else:
        assert args.manifest, "--manifest required"
    cfg = load_config(args.config) if args.config else default_config()
    if args.model == "classifier":
        train_classifier(cfg, args.clean, args.noise, args.logs)
    elif args.model == "gpt":
        train_gpt(cfg, args.manifest, args.logs)
    elif args.model == "clvp":
        train_clvp(cfg, args.manifest, args.logs)
    elif args.model == "vqvae":
        train_vqvae(cfg, args.manifest, args.logs)
    elif args.model == "diffusion":
        from ttts_tpu.train.checkpoints import CheckpointManager

        assert args.gpt_ckpt, "--gpt-ckpt required"
        _, tree = CheckpointManager(args.gpt_ckpt).restore()
        gpt_params = tree["params"] if "params" in tree else tree
        # TrainState.params from train_gpt is already the full variables
        # dict ({"params": ...}); wrap only a bare param tree
        if not (isinstance(gpt_params, dict) and "params" in gpt_params):
            gpt_params = {"params": gpt_params}
        train_diffusion(cfg, args.manifest, gpt_params, args.logs)


if __name__ == "__main__":
    main()

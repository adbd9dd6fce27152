"""In-jit DSP share of the codec GAN step (VERDICT r2 next #9).

The VQVAE GAN step computes its DSP inside the compiled program: the NANSY
device warp + parametric EQ, two linear spectrograms (clean + augmented),
and the mel losses' mel spectrograms. Before writing a fused Pallas log-mel
kernel, measure what fraction of the step that DSP actually is — skip the
kernel with a recorded number if < 5%.

Times (a) the full vqvae_train_step and (b) a DSP-only jit program at the
SAME shapes on the default backend, both with forced host fetch.

    python scripts/bench_gan_dsp.py [--batch 16] [--secs 8] [--iters 3]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _timeit(fn, iters):
    fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=float, default=8.0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--component", choices=["all", "specmel", "warp"],
                    default="all",
                    help="which slice of the in-jit DSP the dsp_only program "
                         "times: everything, spectrograms+mels only (the "
                         "fused-log-mel-kernel candidate), or the NANSY "
                         "warp+PEQ only")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ttts_tpu.config import default_config
    from ttts_tpu.data.augment import apply_peq, sample_params, warp_batch_device
    from ttts_tpu.models.discriminator import MultiPeriodDiscriminator
    from ttts_tpu.models.vqvae import SynthesizerTrn
    from ttts_tpu.ops.mel import vits_mel_spectrogram, vits_spectrogram
    from ttts_tpu.train.mains import make_vqvae_augment_cfg
    from ttts_tpu.train.state import TrainState
    from ttts_tpu.train.steps import vqvae_train_step

    cfg = default_config()
    a = cfg.audio
    aug_cfg = make_vqvae_augment_cfg(cfg)

    b = args.batch
    t = int(args.secs * a.sampling_rate) // a.hop_length * a.hop_length
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((b, t, 1)).astype(np.float32) * 0.1)
    spec_len = jnp.full((b,), t // a.hop_length, jnp.int32)
    text = jnp.asarray(rng.integers(1, 250, size=(b, 24)))
    text_len = jnp.full((b,), 24, jnp.int32)
    batch = {"wav": wav, "spec_lengths": spec_len, "text": text,
             "text_lengths": text_len}

    gen = SynthesizerTrn(cfg.vqvae, spec_channels=a.filter_length // 2 + 1,
                         segment_frames=cfg.train.segment_size // a.hop_length)
    disc = MultiPeriodDiscriminator()

    import optax

    def init_states(key):
        kg, kd = jax.random.split(key)
        spec0 = vits_spectrogram(wav[..., 0], a.filter_length, a.hop_length,
                                 a.win_length).swapaxes(1, 2)
        g_vars = gen.init(
            {"params": kg, "noise": kg, "slice": kg, "vq": kg, "dropout": kg},
            wav, wav, spec0, spec0, spec_len, text, text_len, train=True)
        seg0 = wav[:1, : cfg.train.segment_size]
        d_vars = disc.init(kd, seg0, seg0)
        return g_vars, d_vars

    g_vars, d_vars = jax.jit(init_states)(jax.random.key(0))
    tx = optax.adamw(2e-4)
    g_state = TrainState.create(
        apply_fn=gen.apply, params=g_vars["params"], tx=tx,
        extra_vars={"codebook": g_vars["codebook"]})
    d_state = TrainState.create(apply_fn=disc.apply,
                                params=d_vars["params"], tx=tx)

    step = jax.jit(lambda gs, ds_, bt, k: vqvae_train_step(
        gs, ds_, bt, k, gen, disc, a, augment_cfg=aug_cfg, device_warp=True))

    def run_step():
        out = step(g_state, d_state, batch, jax.random.key(1))
        np.asarray(jax.tree_util.tree_leaves(out[2])[0])

    dt_step = _timeit(run_step, args.iters)

    # ---- DSP-only program: exactly the step's in-jit DSP -------------------
    def dsp_only(bt, key):
        k_aug, k_warp = jax.random.split(key)
        acc = jnp.float32(0)
        wav_aug = bt["wav"][..., 0]
        if args.component in ("all", "warp"):
            warped = warp_batch_device(k_warp, bt["wav"][..., 0], aug_cfg)
            p = sample_params(k_aug, bt["wav"].shape[0], aug_cfg)
            wav_aug = apply_peq(warped, p["quality_power"], p["gain"], aug_cfg)
            acc = acc + wav_aug.sum()
        if args.component in ("all", "specmel"):
            spec = vits_spectrogram(bt["wav"][..., 0], a.filter_length,
                                    a.hop_length, a.win_length)
            spec_aug = vits_spectrogram(wav_aug, a.filter_length, a.hop_length,
                                        a.win_length)
            seg = cfg.train.segment_size
            mel = vits_mel_spectrogram(
                bt["wav"][:, :seg, 0], a.filter_length, a.n_mel_channels,
                a.sampling_rate, a.hop_length, a.win_length, a.mel_fmin,
                a.mel_fmax)
            mel2 = vits_mel_spectrogram(
                wav_aug[:, :seg], a.filter_length, a.n_mel_channels,
                a.sampling_rate, a.hop_length, a.win_length, a.mel_fmin,
                a.mel_fmax)
            acc = acc + spec.sum() + spec_aug.sum() + mel.sum() + mel2.sum()
        return acc

    dsp_j = jax.jit(dsp_only)
    dt_dsp = _timeit(lambda: np.asarray(dsp_j(batch, jax.random.key(1))),
                     args.iters)

    res = {
        "backend": jax.default_backend(),
        "batch": b, "secs_per_clip": args.secs,
        "gan_step_ms": round(dt_step * 1e3, 1),
        "dsp_only_ms": round(dt_dsp * 1e3, 1),
        "dsp_share": round(dt_dsp / dt_step, 4),
        "train_audio_sec_per_sec": round(b * args.secs / dt_step, 1),
        "component": args.component,
        "note": "dsp = device warp + PEQ + 2x linear spec + 2x mel (fwd only)",
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""System-level *learning* evidence: every trainer converges, not just steps.

The five-stage recipe (test_five_stage_recipe.py) proves plumbing — configs,
datasets, checkpoints, serving glue. This file proves the training math
itself: per model family, train N steps on a tiny fixed batch and assert
  (a) the smoothed loss falls by a set factor,
  (b) codec reconstruction SNR (mel-domain, deterministic infer) improves
      over step 0,
  (c) the GPT *overfits* a 4-utterance set to near-zero mel CE,
  (d) the diffusion eval-loop sample's MSE-to-target drops after training.

Behavioral contract: the reference's five-loop pipeline in
ttts/train_step.py:1-7 (each stage's train.py is expected to reduce its loss;
the reference never asserts this anywhere — we do). The runner functions are
importable; scripts/tpu_smoke.py --converge replays them on the real chip.

Each runner wraps N optimizer steps in ONE jitted lax.scan so the whole
trajectory costs a single dispatch (and a single compile) — the per-step
python-loop alternative is pathologically slow over the TPU tunnel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.config import (
    AudioConfig,
    CLVPConfig,
    ClassifierConfig,
    DiffusionNetConfig,
    GPTConfig,
    VQVAEConfig,
)
from ttts_tpu.diffusion.gaussian import (
    GaussianDiffusion,
    SpacedDiffusion,
    get_named_beta_schedule,
    space_timesteps,
)
from ttts_tpu.models.clvp import CLVP
from ttts_tpu.models.classifier import AudioMiniEncoderWithClassifierHead
from ttts_tpu.models.diffusion_net import AA_diffusion
from ttts_tpu.models.discriminator import MultiPeriodDiscriminator
from ttts_tpu.models.gpt import UnifiedVoice
from ttts_tpu.models.vqvae import SynthesizerTrn
from ttts_tpu.ops.mel import vits_mel_spectrogram
from ttts_tpu.train.state import TrainState, make_adamw, make_gan_adam
from ttts_tpu.train.steps import (
    classifier_train_step,
    clvp_train_step,
    diffusion_train_step,
    gpt_train_step,
    vqvae_train_step,
)

pytestmark = pytest.mark.heavy  # compile-heavy; fast loop = -m "not heavy"


def _scan_steps(step_fn, state, batch, key, n):
    """Run `n` train steps as one jitted lax.scan; returns (state, metrics)
    where each metrics leaf is the (n,) per-step trajectory."""

    @jax.jit
    def run(state):
        def body(st, i):
            st, m = step_fn(st, batch, jax.random.fold_in(key, i))
            return st, m

        return jax.lax.scan(body, state, jnp.arange(n))

    return run(state)


def _smoothed_drop(losses, k=10):
    """(head_mean, tail_mean) of a per-step loss trajectory."""
    losses = np.asarray(losses, np.float64)
    return float(losses[:k].mean()), float(losses[-k:].mean())


# ------------------------------------------------------------------- GPT (c)


def converge_gpt(steps=600, lr=3e-3):
    """The GPT must OVERFIT a fixed 4-utterance set to near-zero mel CE —
    the memorization sanity check the reference's gpt/train.py never runs.
    Dropout off for a clean overfit (the convergence claim, not the
    regularization claim, is under test)."""
    rng = np.random.default_rng(0)
    cfg = GPTConfig(model_dim=64, layers=2, heads=2, max_text_tokens=16,
                    max_mel_tokens=24, number_mel_codes=34, start_mel_token=32,
                    stop_mel_token=33, dropout=0.0, attn_dropout=0.0)
    model = UnifiedVoice(cfg)
    batch = {
        "text": jnp.asarray(rng.integers(1, 100, size=(4, 8))),
        "text_lengths": jnp.asarray([8, 6, 8, 5]),
        "mel_codes": jnp.asarray(rng.integers(0, 32, size=(4, 12))),
        "wav_lengths": jnp.asarray([12, 10, 8, 12]) * 1024,
    }
    params = model.init(jax.random.key(0), batch["text"], batch["text_lengths"],
                        batch["mel_codes"], batch["wav_lengths"])
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_adamw(lr, warmup_steps=10))
    _, m = _scan_steps(lambda s, b, k: gpt_train_step(s, b, k, model),
                       state, batch, jax.random.key(1), steps)
    head, tail = _smoothed_drop(m["loss_mel"])
    return {"mel_ce_start": head, "mel_ce_final": tail}


@pytest.mark.slow
def test_gpt_overfits_tiny_set():
    r = converge_gpt()
    # random-init CE ≈ ln(34) ≈ 3.5; memorized ≈ 0
    assert r["mel_ce_final"] < 0.15, r
    assert r["mel_ce_final"] < r["mel_ce_start"] / 10.0, r


# ------------------------------------------------------------------ CLVP (a)


def converge_clvp(steps=300, lr=1e-3):
    rng = np.random.default_rng(13)
    cfg = CLVPConfig(dim_text=16, dim_speech=16, dim_latent=8,
                     num_text_tokens=32, num_speech_tokens=32,
                     text_enc_depth=1, speech_enc_depth=1, text_heads=2,
                     speech_heads=2)
    model = CLVP(cfg)
    batch = {
        "text": jnp.asarray(rng.integers(0, 32, size=(4, 6))),
        "speech_tokens": jnp.asarray(rng.integers(0, 32, size=(4, 10))),
    }
    params = model.init(jax.random.key(0), batch["text"], batch["speech_tokens"])
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_adamw(lr, warmup_steps=10))
    _, m = _scan_steps(lambda s, b, k: clvp_train_step(s, b, k, model),
                       state, batch, jax.random.key(1), steps)
    head, tail = _smoothed_drop(m["loss"])
    return {"loss_start": head, "loss_final": tail}


@pytest.mark.slow
def test_clvp_converges():
    r = converge_clvp()
    # symmetric InfoNCE over B=4 starts near ln(4) ≈ 1.386
    assert r["loss_final"] < 0.3, r
    assert r["loss_final"] < r["loss_start"] / 3.0, r


# ------------------------------------------------------------ classifier (a)


def converge_classifier(steps=150, lr=1e-3):
    rng = np.random.default_rng(7)
    model = AudioMiniEncoderWithClassifierHead(ClassifierConfig(
        spec_dim=8, embedding_dim=32, depth=1, resnet_blocks=1,
        attn_blocks=1, base_channels=4))
    batch = {
        "mel": jnp.asarray(rng.standard_normal((4, 32, 8)).astype(np.float32)),
        "labels": jnp.asarray([0, 1, 0, 1]),
    }
    params = model.init(jax.random.key(0), batch["mel"])
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_adamw(lr, warmup_steps=10))
    _, m = _scan_steps(lambda s, b, k: classifier_train_step(s, b, k, model),
                       state, batch, jax.random.key(1), steps)
    head, tail = _smoothed_drop(m["loss"])
    return {"loss_start": head, "loss_final": tail}


@pytest.mark.slow
def test_classifier_converges():
    r = converge_classifier()
    assert r["loss_final"] < 0.2, r  # CE starts near ln(2) ≈ 0.693
    assert r["loss_final"] < r["loss_start"] / 3.0, r


# --------------------------------------------------------- VQ-VAE GAN (a, b)


def converge_vqvae(steps=200, lr=1e-3):
    """GAN convergence + reconstruction-SNR improvement. The mel L1 term
    (×45, vqvae/train.py:388) dominates the G loss and must fall; the
    deterministic full-length infer() reconstruction must get closer to the
    real signal in mel-SNR terms than the random-init model."""
    rng = np.random.default_rng(9)
    # real 32 kHz geometry (1024/640) so the in-step vits_spectrogram and the
    # SNR eval below run on genuine spectrograms of the wav
    spec_ch, frames, hop = 513, 8, 640
    audio = AudioConfig(n_mel_channels=16, filter_length=1024, hop_length=hop,
                        win_length=1024)
    gen = SynthesizerTrn(
        VQVAEConfig(inter_channels=16, hidden_channels=16, filter_channels=32,
                    n_heads=2, n_layers=2, p_dropout=0.0,
                    upsample_initial_channel=32, gin_channels=16,
                    codebook_bins=32, posterior_wn_layers=2, flow_layers=1,
                    flow_wn_layers=1),
        spec_channels=spec_ch, segment_frames=4)
    disc = MultiPeriodDiscriminator(periods=(2, 3))
    # deterministic "speech": tones, so the mel target is structured
    t = np.arange(frames * hop) / 32000.0
    wav = np.stack([0.3 * np.sin(2 * np.pi * 220.0 * t),
                    0.3 * np.sin(2 * np.pi * 330.0 * t)]).astype(np.float32)
    batch = {
        "wav": jnp.asarray(wav)[..., None],
        "spec_lengths": jnp.asarray([frames, frames]),
        "text": jnp.asarray(rng.integers(0, 30, size=(2, 6))),
        "text_lengths": jnp.asarray([6, 4]),
    }
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "slice": jax.random.key(2), "vq": jax.random.key(3)}
    g_vars = gen.init(rngs, batch["wav"], batch["wav"],
                      jnp.zeros((2, frames, spec_ch)),
                      jnp.zeros((2, frames, spec_ch)),
                      batch["spec_lengths"], batch["text"],
                      batch["text_lengths"], train=True)
    seg = jnp.zeros((2, 4 * hop, 1))
    d_params = disc.init(jax.random.key(4), seg, seg)["params"]
    g_state = TrainState.create(apply_fn=gen.apply, params=g_vars["params"],
                                tx=make_gan_adam(lr),
                                extra_vars={"codebook": g_vars["codebook"]})
    d_state = TrainState.create(apply_fn=disc.apply, params=d_params,
                                tx=make_gan_adam(lr))

    a = audio

    def mel_of(w):
        return vits_mel_spectrogram(w[..., 0], a.filter_length,
                                    a.n_mel_channels, a.sampling_rate,
                                    a.hop_length, a.win_length,
                                    a.mel_fmin, a.mel_fmax)

    @jax.jit
    def recon_snr_db(params, extra):
        from ttts_tpu.ops.mel import vits_spectrogram

        spec = vits_spectrogram(batch["wav"][..., 0], a.filter_length,
                                a.hop_length, a.win_length).swapaxes(1, 2)
        y_hat = gen.apply(
            {"params": params, **extra},
            batch["wav"], spec, batch["spec_lengths"],
            batch["text"], batch["text_lengths"],
            method=gen.infer, rngs={"noise": jax.random.key(42)},
        )
        n = min(y_hat.shape[1], batch["wav"].shape[1])
        m_real, m_rec = mel_of(batch["wav"][:, :n]), mel_of(y_hat[:, :n])
        num = jnp.sum(jnp.square(m_real))
        den = jnp.sum(jnp.square(m_real - m_rec)) + 1e-12
        return 10.0 * jnp.log10(num / den)

    snr0 = float(recon_snr_db(g_state.params, g_state.extra_vars))

    @jax.jit
    def run(g_state, d_state):
        def body(carry, i):
            g, d = carry
            g, d, m = vqvae_train_step(g, d, batch, jax.random.fold_in(
                jax.random.key(11), i), gen, disc, audio)
            return (g, d), m["loss_mel"]

        return jax.lax.scan(body, (g_state, d_state), jnp.arange(steps))

    (g_state, d_state), mel_losses = run(g_state, d_state)
    head, tail = _smoothed_drop(mel_losses, k=20)
    snr1 = float(recon_snr_db(g_state.params, g_state.extra_vars))
    return {"mel_l1_start": head, "mel_l1_final": tail,
            "snr_db_step0": snr0, "snr_db_final": snr1}


@pytest.mark.slow
def test_vqvae_gan_converges_and_snr_improves():
    r = converge_vqvae()
    assert r["mel_l1_final"] < r["mel_l1_start"] * 0.7, r
    assert r["snr_db_final"] > r["snr_db_step0"] + 1.0, r


# ---------------------------------------------------------- diffusion (a, d)


def converge_diffusion(steps=400, lr=1e-3):
    """Training loss falls AND a full eval sampling loop (ddim over a spaced
    schedule, fixed noise) lands closer to the training target after
    training than at random init (diffusion/train.py's eval intent)."""
    rng = np.random.default_rng(5)
    gcfg = GPTConfig(model_dim=32, layers=1, heads=2, max_text_tokens=16,
                     max_mel_tokens=24, number_mel_codes=34,
                     start_mel_token=32, stop_mel_token=33)
    gpt = UnifiedVoice(gcfg)
    gbatch = {
        "text": jnp.asarray(rng.integers(1, 100, size=(2, 8))),
        "text_lengths": jnp.asarray([8, 6]),
        "mel_codes": jnp.asarray(rng.integers(0, 32, size=(2, 12))),
        "wav_lengths": jnp.asarray([12, 10]) * 1024,
    }
    gparams = gpt.init(jax.random.key(0), gbatch["text"], gbatch["text_lengths"],
                       gbatch["mel_codes"], gbatch["wav_lengths"])

    net_cfg = DiffusionNetConfig(in_channels=6, out_channels=12,
                                 model_channels=32, num_heads=4, num_layers=2,
                                 in_latent_channels=gcfg.model_dim)
    net = AA_diffusion(net_cfg)
    n_train_t = 100
    betas = get_named_beta_schedule("linear", n_train_t)
    diffuser = GaussianDiffusion(betas=betas)
    # smooth low-rank target so a tiny net can actually learn it
    tt = np.linspace(0, 2 * np.pi, 24)[None, :, None]
    ch = np.arange(6)[None, None, :]
    x_start = np.sin(tt + ch * 0.7) * np.array([1.0, 0.6])[:, None, None]
    batch = dict(gbatch)
    batch["mel"] = jnp.asarray(x_start.astype(np.float32))
    batch["mel_refer"] = jnp.asarray(
        rng.standard_normal((2, 10, 6)).astype(np.float32))
    params = net.init(jax.random.key(1), batch["mel"], jnp.asarray([1.0] * 2),
                      jnp.zeros((2, 12, gcfg.model_dim)), batch["mel_refer"])
    state = TrainState.create(apply_fn=net.apply, params=params,
                              tx=make_adamw(lr, warmup_steps=10))

    latent = gpt.apply(gparams, batch["text"], batch["text_lengths"],
                       batch["mel_codes"], batch["wav_lengths"],
                       return_latent=True)
    refer = batch["mel_refer"]
    sd = SpacedDiffusion(use_timesteps=space_timesteps(n_train_t, [10]),
                         betas=betas)

    @jax.jit
    def eval_mse(params):
        def model_fn(x, t_float, **kw):
            return net.apply(params, x, t_float, latent, refer, train=False)

        x = sd.ddim_sample_loop(model_fn, batch["mel"].shape, jax.random.key(9))
        return jnp.mean(jnp.square(x - batch["mel"]))

    mse0 = float(eval_mse(state.params))
    final_state, m = _scan_steps(
        lambda s, b, k: diffusion_train_step(s, b, k, net, diffuser, gpt,
                                             gparams,
                                             unconditioned_percentage=0.0),
        state, batch, jax.random.key(3), steps)
    head, tail = _smoothed_drop(m["loss"], k=30)
    mse1 = float(eval_mse(final_state.params))
    return {"loss_start": head, "loss_final": tail,
            "sample_mse_step0": mse0, "sample_mse_final": mse1}


@pytest.mark.slow
def test_diffusion_converges_and_samples_approach_target():
    r = converge_diffusion()
    assert r["loss_final"] < r["loss_start"] * 0.7, r
    assert r["sample_mse_final"] < r["sample_mse_step0"] * 0.8, r

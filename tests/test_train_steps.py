"""Train-step tests: one jitted step per model family, loss decreases on a
fixed batch, and multi-device sharding produces identical results."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.config import (
    AudioConfig,
    CLVPConfig,
    DiffusionNetConfig,
    GPTConfig,
    MeshConfig,
    VQVAEConfig,
)
from ttts_tpu.diffusion.gaussian import GaussianDiffusion, get_named_beta_schedule
from ttts_tpu.models.clvp import CLVP
from ttts_tpu.models.diffusion_net import AA_diffusion
from ttts_tpu.models.discriminator import MultiPeriodDiscriminator
from ttts_tpu.models.gpt import UnifiedVoice
from ttts_tpu.models.vqvae import SynthesizerTrn
from ttts_tpu.parallel import make_mesh, replicate, shard_batch
from ttts_tpu.train.state import TrainState, make_adamw, make_gan_adam
from ttts_tpu.train.steps import (
    clvp_train_step,
    diffusion_train_step,
    gpt_train_step,
    vqvae_train_step,
)

GPT_TINY = GPTConfig(model_dim=32, layers=1, heads=2, max_text_tokens=16,
                     max_mel_tokens=24, number_mel_codes=34, start_mel_token=32,
                     stop_mel_token=33)


def _gpt_fixture():
    rng = np.random.default_rng(0)
    model = UnifiedVoice(GPT_TINY)
    batch = {
        "text": jnp.asarray(rng.integers(1, 100, size=(4, 8))),
        "text_lengths": jnp.asarray([8, 6, 8, 5]),
        "mel_codes": jnp.asarray(rng.integers(0, 32, size=(4, 12))),
        "wav_lengths": jnp.asarray([12, 10, 8, 12]) * 1024,
    }
    params = model.init(jax.random.key(0), batch["text"], batch["text_lengths"],
                        batch["mel_codes"], batch["wav_lengths"])
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=make_adamw(1e-3, warmup_steps=1)
    )
    return model, state, batch


class TestGPTStep:
    def test_loss_decreases(self):
        model, state, batch = _gpt_fixture()
        step = jax.jit(lambda s, b, k: gpt_train_step(s, b, k, model))
        key = jax.random.key(1)
        _, m0 = step(state, batch, key)
        for i in range(8):
            state, m = step(state, batch, jax.random.fold_in(key, i))
        assert float(m["loss"]) < float(m0["loss"])
        assert np.isfinite(float(m["grad_norm"]))

    def test_sharded_batch_matches(self):
        model, state, batch = _gpt_fixture()
        mesh = make_mesh(MeshConfig(data=4, model=1), devices=jax.devices()[:4])
        step = jax.jit(lambda s, b, k: gpt_train_step(s, b, k, model))
        key = jax.random.key(2)
        _, m_single = step(state, batch, key)
        sharded = {
            k: jax.device_put(v, shard_batch(mesh, v.ndim)) for k, v in batch.items()
        }
        state_r = jax.device_put(state, replicate(mesh))
        _, m_sharded = step(state_r, sharded, key)
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-5
        )


class TestDiffusionStep:
    def test_loss_finite_and_decreases(self):
        rng = np.random.default_rng(5)
        gpt_model, gpt_state, gpt_batch = _gpt_fixture()
        net_cfg = DiffusionNetConfig(in_channels=6, out_channels=12, model_channels=32,
                                     num_heads=4, num_layers=2,
                                     in_latent_channels=GPT_TINY.model_dim)
        net = AA_diffusion(net_cfg)
        # scaled-linear β explodes for very small T (β_end→1); 100 is the
        # smallest sane table for tests
        diffuser = GaussianDiffusion(betas=get_named_beta_schedule("linear", 100))
        batch = dict(gpt_batch)
        batch["mel"] = jnp.asarray(rng.standard_normal((4, 24, 6)).astype(np.float32))
        batch["mel_refer"] = jnp.asarray(rng.standard_normal((4, 10, 6)).astype(np.float32))
        params = net.init(
            jax.random.key(0), batch["mel"], jnp.asarray([1.0] * 4),
            jnp.zeros((4, 12, GPT_TINY.model_dim)), batch["mel_refer"],
        )
        state = TrainState.create(apply_fn=net.apply, params=params,
                                  tx=make_adamw(1e-3, warmup_steps=1))
        step = jax.jit(
            lambda s, b, k: diffusion_train_step(
                s, b, k, net, diffuser, gpt_model, gpt_state.params
            )
        )
        key = jax.random.key(3)
        _, m0 = step(state, batch, key)
        assert np.isfinite(float(m0["loss"]))
        for i in range(6):
            state, m = step(state, batch, jax.random.fold_in(key, 100 + i))
        assert np.isfinite(float(m["loss"]))


VQ_TINY = VQVAEConfig(inter_channels=16, hidden_channels=16, filter_channels=32,
                      n_heads=2, n_layers=2, p_dropout=0.0,
                      upsample_initial_channel=32, gin_channels=16, codebook_bins=32,
                      posterior_wn_layers=2, flow_layers=1, flow_wn_layers=1)


@pytest.mark.heavy  # the two-optimizer GAN step is the suite's longest compile
class TestVQVAEStep:
    def test_gan_step_runs(self):
        rng = np.random.default_rng(9)
        spec_ch, frames, hop = 33, 8, 640
        gen = SynthesizerTrn(VQ_TINY, spec_channels=spec_ch, segment_frames=4)
        disc = MultiPeriodDiscriminator(periods=(2, 3))
        audio = AudioConfig(n_mel_channels=16, filter_length=1024, hop_length=hop,
                            win_length=1024)
        batch = {
            "wav": jnp.asarray(rng.standard_normal((2, frames * hop, 1)).astype(np.float32) * 0.1),
            "spec": jnp.asarray(rng.standard_normal((2, frames, spec_ch)).astype(np.float32)),
            "spec_lengths": jnp.asarray([frames, frames]),
            "text": jnp.asarray(rng.integers(0, 30, size=(2, 6))),
            "text_lengths": jnp.asarray([6, 4]),
        }
        batch["wav_aug"] = batch["wav"]
        batch["spec_aug"] = batch["spec"]
        rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
                "slice": jax.random.key(2), "vq": jax.random.key(3)}
        g_vars = gen.init(rngs, batch["wav"], batch["wav_aug"], batch["spec"],
                          batch["spec_aug"], batch["spec_lengths"], batch["text"],
                          batch["text_lengths"], train=True)
        g_params = g_vars["params"]
        extra = {"codebook": g_vars["codebook"]}
        seg_wav = jnp.zeros((2, 4 * hop, 1))
        d_params = disc.init(jax.random.key(4), seg_wav, seg_wav)["params"]
        g_state = TrainState.create(apply_fn=gen.apply, params=g_params,
                                    tx=make_gan_adam(2e-4), extra_vars=extra)
        d_state = TrainState.create(apply_fn=disc.apply, params=d_params,
                                    tx=make_gan_adam(2e-4))
        step = jax.jit(
            lambda g, d, b, k: vqvae_train_step(g, d, b, k, gen, disc, audio)
        )
        g_state, d_state, metrics = step(g_state, d_state, batch, jax.random.key(7))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        # codebook was updated (k-means init happened)
        assert bool(g_state.extra_vars["codebook"]["quantizer"]["state"].inited)
        # second step also runs (post-init path)
        g_state, d_state, metrics = step(g_state, d_state, batch, jax.random.key(8))
        assert np.isfinite(float(metrics["loss_gen_all"]))


class TestCLVPStep:
    def test_loss_decreases(self):
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
                                  tx=make_adamw(1e-3, warmup_steps=1))
        step = jax.jit(lambda s, b, k: clvp_train_step(s, b, k, model))
        key = jax.random.key(1)
        _, m0 = step(state, batch, key)
        for i in range(10):
            state, m = step(state, batch, jax.random.fold_in(key, i))
        assert float(m["loss"]) < float(m0["loss"])


class TestNonFiniteGuard:
    """apply_gradients_safe (SURVEY §5.2): a NaN/inf gradient step must be
    skipped in-jit — params, opt_state, and EMA pass through unchanged and
    the metric flag reports the skip."""

    def _state(self):
        import optax

        params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
        return TrainState.create(
            apply_fn=lambda p, x: x, params=params,
            tx=make_adamw(1e-2, warmup_steps=1),
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
        )

    def test_finite_grads_apply(self):
        from ttts_tpu.train.steps import apply_gradients_safe

        state = self._state()
        grads = {"w": jnp.full((3,), 0.5), "b": jnp.full((2,), -0.5)}
        new_state, norm, finite = jax.jit(apply_gradients_safe)(state, grads)
        assert bool(finite)
        assert np.isfinite(float(norm))
        assert int(new_state.step) == 1
        assert not np.allclose(np.asarray(new_state.params["w"]),
                               np.asarray(state.params["w"]))

    def test_nonfinite_grads_skip(self):
        from ttts_tpu.train.steps import apply_gradients_safe

        state = self._state()
        grads = {"w": jnp.array([1.0, jnp.nan, 2.0]), "b": jnp.full((2,), jnp.inf)}
        new_state, norm, finite = jax.jit(apply_gradients_safe)(state, grads)
        assert not bool(finite)
        np.testing.assert_array_equal(np.asarray(new_state.params["w"]),
                                      np.asarray(state.params["w"]))
        np.testing.assert_array_equal(np.asarray(new_state.params["b"]),
                                      np.asarray(state.params["b"]))
        # step counter also frozen — the skipped step does not advance schedules
        assert int(new_state.step) == int(state.step)

"""Diffusion engine + AA_diffusion tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.config import DiffusionNetConfig
from ttts_tpu.diffusion.dpm import _alpha_sigma, dpm_solver_pp_2m_sample
from ttts_tpu.diffusion.gaussian import (
    GaussianDiffusion,
    SpacedDiffusion,
    get_named_beta_schedule,
    space_timesteps,
)
from ttts_tpu.models.diffusion_net import (
    AA_diffusion,
    denormalize_tacotron_mel,
    normalize_tacotron_mel,
    timestep_embedding,
)


class TestSchedule:
    def test_linear_schedule_endpoints(self):
        b = get_named_beta_schedule("linear", 1000)
        assert np.isclose(b[0], 1e-4) and np.isclose(b[-1], 0.02)

    def test_space_timesteps_50(self):
        s = space_timesteps(1000, [50])
        assert len(s) == 50
        assert 0 in s and 999 in s

    def test_spaced_diffusion_has_50_steps(self):
        sd = SpacedDiffusion(
            use_timesteps=space_timesteps(1000, [50]),
            betas=get_named_beta_schedule("linear", 1000),
        )
        assert sd.num_timesteps == 50
        assert len(sd.timestep_map) == 50

    def test_q_sample_interpolates(self, rng):
        gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 1000))
        x0 = jnp.ones((2, 8, 4))
        t = jnp.asarray([0, 999])
        xt = gd.q_sample(x0, t, jnp.zeros_like(x0))
        # t=0: nearly x0; t=999: nearly zero mean
        assert abs(float(xt[0].mean()) - 1.0) < 1e-3
        assert abs(float(xt[1].mean())) < 0.2


class TestTrainingLoss:
    def test_perfect_model_zero_mse(self, rng):
        gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 1000))
        x0 = jnp.asarray(rng.standard_normal((2, 16, 4)).astype(np.float32))
        key = jax.random.key(0)
        # a model that returns the exact noise (recovered from x_t analytically)
        noise = jax.random.normal(key, x0.shape)
        t = jnp.asarray([10, 500])

        def perfect_model(x_t, t_in, **kw):
            return jnp.concatenate([noise, jnp.zeros_like(noise)], axis=-1)

        losses = gd.training_losses(perfect_model, x0, t, key)
        assert float(losses["mse"].max()) < 1e-9
        assert np.isfinite(np.asarray(losses["loss"])).all()


class TestSamplers:
    def _analytic_model(self, gd, mu):
        """Optimal ε for data = δ(mu): ε̂ = (x − √ᾱ·mu)/√(1−ᾱ)."""

        def model(x, t_in, conditioning_free=False, **kw):
            # t_in may be remapped floats; invert via the spaced index given
            # by kw['_t_idx'] — here we use the closure trick instead
            raise NotImplementedError

        return model

    def test_ddim_converges_to_data(self):
        steps = space_timesteps(1000, [50])
        gd = SpacedDiffusion(use_timesteps=steps, betas=get_named_beta_schedule("linear", 1000))
        mu = 0.7

        def model(x, t_float, **kw):
            # recover ᾱ from the *spaced* index: t_float = timestep_map[t]
            tmap = np.array(gd.timestep_map, dtype=np.float32)
            idx = jnp.searchsorted(jnp.asarray(tmap), t_float[0])
            abar = jnp.asarray(gd.alphas_cumprod, jnp.float32)[idx]
            eps = (x - jnp.sqrt(abar) * mu) / jnp.sqrt(1 - abar)
            var = -jnp.ones_like(x)  # min log variance
            return jnp.concatenate([eps, var], axis=-1)

        x = gd.ddim_sample_loop(model, (2, 8, 4), jax.random.key(0))
        assert abs(float(x.mean()) - mu) < 0.05

    def test_dpmpp_2m_converges_to_data(self):
        mu = -0.4

        def eps_fn(x, t):
            alpha, sigma = _alpha_sigma(t)
            return (x - alpha * mu) / sigma

        x = dpm_solver_pp_2m_sample(eps_fn, jax.random.normal(jax.random.key(1), (2, 8, 4)), steps=50)
        # residual noise at t_end=1e-3 has σ≈5e-3; allow a few σ
        np.testing.assert_allclose(np.asarray(x), mu, atol=0.03)

    def test_p_sample_loop_runs(self):
        gd = SpacedDiffusion(
            use_timesteps=space_timesteps(100, [10]),
            betas=get_named_beta_schedule("linear", 100),
        )

        def model(x, t_float, **kw):
            return jnp.concatenate([jnp.zeros_like(x), -jnp.ones_like(x)], axis=-1)

        x = gd.p_sample_loop(model, (1, 4, 2), jax.random.key(0))
        assert np.isfinite(np.asarray(x)).all()


TINY_NET = DiffusionNetConfig(
    in_channels=8, out_channels=16, model_channels=32, num_heads=4,
    num_layers=2, in_latent_channels=12, layer_drop=0.1,
)


class TestAADiffusion:
    @pytest.fixture(scope="class")
    def net(self):
        model = AA_diffusion(TINY_NET)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 20, 8)).astype(np.float32))
        t = jnp.asarray([10.0, 500.0])
        latent = jnp.asarray(rng.standard_normal((2, 5, 12)).astype(np.float32))
        refer = jnp.asarray(rng.standard_normal((2, 7, 8)).astype(np.float32))
        params = model.init(jax.random.key(0), x, t, latent, refer)
        return model, params, (x, t, latent, refer)

    def test_forward_shape(self, net):
        model, params, (x, t, latent, refer) = net
        out = model.apply(params, x, t, latent, refer)
        assert out.shape == (2, 20, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_conditioning_free(self, net):
        model, params, (x, t, latent, refer) = net
        out = model.apply(params, x, t, conditioning_free=True)
        assert out.shape == (2, 20, 16)

    def test_train_mode_with_dropout_rngs(self, net):
        model, params, (x, t, latent, refer) = net
        out = model.apply(
            params, x, t, latent, refer, train=True,
            rngs={"uncond": jax.random.key(1), "layerdrop": jax.random.key(2),
                  "dropout": jax.random.key(3)},
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_timestep_embedding_fractional(self):
        e = timestep_embedding(jnp.asarray([0.5, 10.0]), 32)
        assert e.shape == (2, 32)
        # cos-first layout: at t=0 the first half is all ones
        e0 = timestep_embedding(jnp.asarray([0.0]), 32)
        np.testing.assert_allclose(np.asarray(e0[0, :16]), 1.0)

    def test_mel_normalization_roundtrip(self, rng):
        # values below -TACOTRON_MEL_MAX are clamped (aa_model.py:22)
        mel = jnp.asarray(rng.uniform(-5.5, 2, size=(2, 4, 8)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(denormalize_tacotron_mel(normalize_tacotron_mel(mel))),
            np.asarray(mel), rtol=1e-5,
        )

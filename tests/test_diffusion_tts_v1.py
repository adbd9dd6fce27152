"""DiffusionTts (Tortoise v1 decoder) tests (contract: ttts/diffusion/model.py:134-330)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.models.diffusion_tts_v1 import DiffusionTts


@pytest.fixture(scope="module")
def net():
    model = DiffusionTts(model_channels=32, num_layers=2, in_channels=8,
                         in_latent_channels=12, in_tokens=50, out_channels=16,
                         num_heads=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 8)).astype(np.float32))
    t = jnp.asarray([10.0, 600.0])
    latent = jnp.asarray(rng.standard_normal((2, 6, 12)).astype(np.float32))
    cond_mel = jnp.asarray(rng.standard_normal((2, 20, 8)).astype(np.float32))
    params = model.init(jax.random.key(0), x, t, latent, cond_mel)
    return model, params, (x, t, latent, cond_mel)


def test_latent_conditioning(net):
    model, params, (x, t, latent, cond_mel) = net
    out = model.apply(params, x, t, latent, cond_mel)
    assert out.shape == (2, 24, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_code_conditioning_and_mel_pred(net):
    model, params, (x, t, latent, cond_mel) = net
    codes = jnp.asarray(np.random.default_rng(1).integers(0, 50, size=(2, 10)))
    out, mel_pred = model.apply(params, x, t, codes, cond_mel, return_code_pred=True)
    assert out.shape == (2, 24, 16)
    assert mel_pred.shape == (2, 24, 8)


def test_conditioning_free_and_precomputed(net):
    model, params, (x, t, latent, cond_mel) = net
    out = model.apply(params, x, t, conditioning_free=True)
    assert np.isfinite(np.asarray(out)).all()
    emb = model.apply(params, latent, cond_mel, 24,
                      method=model.timestep_independent)
    out2 = model.apply(params, x, t, precomputed_aligned_embeddings=emb)
    assert out2.shape == (2, 24, 16)

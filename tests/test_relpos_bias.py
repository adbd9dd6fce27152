"""Toeplitz-skew rel-pos bias must equal the direct 2D bucket gather."""

import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.models.diffusion_net import RelativePositionBias, _t5_bucket


def test_skew_equals_2d_gather(rng):
    heads, t = 4, 24
    mod = RelativePositionBias(heads=heads, scale=1.3)
    scores = jnp.zeros((2, heads, t, t))
    params = mod.init(jax.random.key(0), scores)
    out = np.asarray(mod.apply(params, scores))

    table = np.asarray(params["params"]["table"]["embedding"])  # (32, H)
    rel = np.arange(t)[None, :] - np.arange(t)[:, None]
    buckets = _t5_bucket(rel)
    expected = np.transpose(table[buckets], (2, 0, 1))[None] * 1.3
    np.testing.assert_allclose(out, np.broadcast_to(expected, out.shape), atol=1e-6)


def test_cross_shape_fallback(rng):
    heads = 2
    mod = RelativePositionBias(heads=heads)
    scores = jnp.zeros((1, heads, 6, 9))
    params = mod.init(jax.random.key(0), scores)
    out = np.asarray(mod.apply(params, scores))
    table = np.asarray(params["params"]["table"]["embedding"])
    rel = np.arange(9)[None, :] - np.arange(6)[:, None]
    expected = np.transpose(table[_t5_bucket(rel)], (2, 0, 1))[None]
    np.testing.assert_allclose(out, expected, atol=1e-6)

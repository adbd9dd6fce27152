"""Flow invertibility + logdet tests (reference ttts/vqvae/modules.py flows)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.models.flows import (
    ActNorm,
    ConvFlow,
    DDSConv,
    ElementwiseAffine,
    InvConvNear,
    LogFlow,
    rational_quadratic_spline,
)


def _mask(b, t):
    return jnp.ones((b, t, 1))


class TestInvertibility:
    def test_elementwise_affine(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))
        m = _mask(2, 6)
        flow = ElementwiseAffine(4)
        params = flow.init(jax.random.key(0), x, m)
        y, logdet = flow.apply(params, x, m)
        x2 = flow.apply(params, y, m, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)
        assert logdet.shape == (2,)

    def test_log_flow(self, rng):
        x = jnp.asarray(np.abs(rng.standard_normal((2, 5, 3))).astype(np.float32) + 0.1)
        m = _mask(2, 5)
        y, logdet = LogFlow()(x, m)
        x2 = LogFlow()(y, m, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-5)

    def test_conv_flow_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32))
        m = _mask(2, 8)
        flow = ConvFlow(4, 16, 3, 2)
        params = flow.init(jax.random.key(0), x, m)
        y, logdet = flow.apply(params, x, m)
        x2 = flow.apply(params, y, m, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
        assert np.isfinite(np.asarray(logdet)).all()

    def test_actnorm_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))
        flow = ActNorm(4)
        params = flow.init(jax.random.key(0), x)
        y, _ = flow.apply(params, x)
        x2 = flow.apply(params, y, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)

    def test_invconv_roundtrip_and_logdet(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 6, 8)).astype(np.float32))
        flow = InvConvNear(8, n_split=4)
        params = flow.init(jax.random.key(0), x)
        y, logdet = flow.apply(params, x)
        x2 = flow.apply(params, y, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
        # orthogonal init with det=+1 → logdet 0
        np.testing.assert_allclose(np.asarray(logdet), 0.0, atol=1e-4)


class TestSpline:
    def test_roundtrip_inside_and_tails(self, rng):
        k = 8
        x = jnp.asarray(np.linspace(-8, 8, 33).astype(np.float32))
        uw = jnp.asarray(rng.standard_normal((33, k)).astype(np.float32))
        uh = jnp.asarray(rng.standard_normal((33, k)).astype(np.float32))
        ud = jnp.asarray(rng.standard_normal((33, k - 1)).astype(np.float32))
        y, ld = rational_quadratic_spline(x, uw, uh, ud, inverse=False)
        x2, ld_inv = rational_quadratic_spline(y, uw, uh, ud, inverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
        np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-4)
        # outside the tail bound the transform is identity
        outside = np.abs(np.asarray(x)) > 5.0
        np.testing.assert_allclose(np.asarray(y)[outside], np.asarray(x)[outside])

    def test_monotone(self, rng):
        k = 6
        x = jnp.asarray(np.linspace(-4.9, 4.9, 100).astype(np.float32))
        uw = jnp.tile(jnp.asarray(rng.standard_normal((1, k)).astype(np.float32)), (100, 1))
        uh = jnp.tile(jnp.asarray(rng.standard_normal((1, k)).astype(np.float32)), (100, 1))
        ud = jnp.tile(jnp.asarray(rng.standard_normal((1, k - 1)).astype(np.float32)), (100, 1))
        y, _ = rational_quadratic_spline(x, uw, uh, ud)
        assert (np.diff(np.asarray(y)) > 0).all()


def test_ddsconv_masked(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 6)).astype(np.float32))
    m = jnp.asarray(np.concatenate([np.ones((2, 7, 1)), np.zeros((2, 3, 1))], 1).astype(np.float32))
    mod = DDSConv(6, 3, 2)
    params = mod.init(jax.random.key(0), x, m)
    y = mod.apply(params, x, m)
    np.testing.assert_allclose(np.asarray(y[:, 7:]), 0.0, atol=1e-6)

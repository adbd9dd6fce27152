"""MDCT/IMDCT tests (contract: ttts/vocoder/spectral_ops.py:78-190)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.ops.mdct import imdct, mdct


@pytest.mark.parametrize("padding", ["same", "center"])
def test_roundtrip(padding, rng):
    frame_len = 64
    t = 64 * 20
    x = rng.standard_normal((2, t)).astype(np.float32) * 0.5
    X = mdct(jnp.asarray(x), frame_len, padding)
    assert X.shape[-1] == frame_len // 2
    y = np.asarray(imdct(X, frame_len, padding))
    # TDAC: interior reconstructs exactly; edges lack overlap
    m = slice(frame_len, -frame_len)
    np.testing.assert_allclose(y[:, m][:, : x.shape[1] - 2 * frame_len],
                               x[:, m], atol=1e-4)


def test_energy_preservation(rng):
    x = rng.standard_normal((1, 1024)).astype(np.float32)
    X = np.asarray(mdct(jnp.asarray(x), 64, "same"))
    assert np.isfinite(X).all()
    # orthonormal-ish scaling: coefficient energy ≈ signal energy
    assert 0.5 < (X**2).sum() / (x**2).sum() < 2.0

"""Ring attention parity vs plain attention on the 8-device CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ttts_tpu.parallel.ring_attention import make_ring_attention


def _plain_attention(q, k, v, causal):
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
    if causal:
        t = q.shape[1]
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_plain(causal, rng):
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("sp",))
    b, t, h, d = 2, 64, 4, 16  # t divisible by 8
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))

    ring = jax.jit(make_ring_attention(mesh, "sp", causal=causal))
    out = ring(q, k, v)
    ref = _plain_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ring_with_toeplitz_bias_matches_plain(rng):
    """Strip-form rel-pos bias rides the ring: per hop only the local
    (Tq, Tk) diagonal window is gathered; must equal dense bias+softmax."""
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("sp",))
    b, t, h, d = 2, 64, 4, 16
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    strip = jnp.asarray(rng.standard_normal((h, 2 * t - 1)).astype(np.float32))

    ring = jax.jit(make_ring_attention(mesh, "sp", with_bias=True))
    out = ring(q, k, v, strip)

    idx = np.arange(t)[None, :] - np.arange(t)[:, None] + t - 1  # j-i+T-1
    bias = np.asarray(strip)[:, idx]  # (H, T, T)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d) + bias[None]
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, axis=-1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_sequence_parallel_diffusion_trunk_matches_dense(rng):
    """Ring attention inside the REAL AA_diffusion forward (VERDICT r3 #3):
    the same params, the same inputs, sp_mesh over 4 devices vs dense —
    outputs must match. This is the §5.7 'strategy, not hook' check."""
    from ttts_tpu.config import DiffusionNetConfig
    from ttts_tpu.models.diffusion_net import AA_diffusion

    cfg = DiffusionNetConfig(in_channels=6, out_channels=12, model_channels=64,
                             num_heads=4, num_layers=2, in_latent_channels=16,
                             dropout=0.0)
    dense = AA_diffusion(cfg)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("sp",))
    sp = AA_diffusion(cfg, sp_mesh=mesh)

    b, t = 2, 32  # t divisible by 4
    x = jnp.asarray(rng.standard_normal((b, t, 6)).astype(np.float32))
    ts = jnp.asarray([3.0, 17.0])
    latent = jnp.asarray(rng.standard_normal((b, 10, 16)).astype(np.float32))
    refer = jnp.asarray(rng.standard_normal((b, 9, 6)).astype(np.float32))

    params = dense.init(jax.random.key(0), x, ts, latent, refer)
    out_dense = jax.jit(lambda p: dense.apply(p, x, ts, latent, refer))(params)
    out_sp = jax.jit(lambda p: sp.apply(p, x, ts, latent, refer))(params)
    assert out_dense.shape == (b, t, 12)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_dense),
                               atol=3e-5, rtol=1e-4)

"""Pallas fused attention vs the naive XLA path (interpret mode on CPU).

The kernel (ops/pallas/attention.py) backs the diffusion trunk's per-step
attention (AttentionBlock flash=True) — scores and the Toeplitz rel-pos bias
never materialize in HBM. Semantics must match utils.AttentionBlock:172-215:
softmax((q·kᵀ)·scale + bias) · v with bias[h,i,j] = strip[h, j−i+T−1]."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.ops.pallas.attention import flash_attention

B, T, H, D = 2, 256, 4, 32
SCALE = 1.0 / math.sqrt(D)


@pytest.fixture(scope="module")
def qkv(rng=np.random.default_rng(0)):
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    strip = jnp.asarray(rng.standard_normal((H, 2 * T - 1)).astype(np.float32)) * 0.5
    return mk(), mk(), mk(), strip


def _naive(q, k, v, strip=None, causal=False):
    s = jnp.einsum("bthd,bshd->bhts", q, k) * SCALE
    if strip is not None:
        i = jnp.arange(T)
        s = s + strip[:, (i[None, :] - i[:, None]) + T - 1][None]
    if causal:
        s = jnp.where(jnp.tril(jnp.ones((T, T), bool))[None, None], s, -jnp.inf)
    return jnp.einsum("bhts,bshd->bthd", jax.nn.softmax(s, axis=-1), v)


@pytest.mark.parametrize("use_strip,causal", [(False, False), (True, False),
                                              (False, True), (True, True)])
def test_flash_matches_naive(qkv, use_strip, causal):
    q, k, v, strip = qkv
    ours = flash_attention(q, k, v, strip=strip if use_strip else None,
                           scale=SCALE, causal=causal, interpret=True)
    ref = _naive(q, k, v, strip=strip if use_strip else None, causal=causal)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_attention_block_flash_flag_falls_back_on_cpu():
    """On CPU the flash flag must silently keep the XLA path (same numbers)."""
    from ttts_tpu.models.diffusion_net import AttentionBlock

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 64)).astype(np.float32))
    blk = AttentionBlock(64, num_heads=4)
    params = blk.init(jax.random.key(0), x)
    blk_f = AttentionBlock(64, num_heads=4, flash=True)
    np.testing.assert_allclose(
        np.asarray(blk_f.apply(params, x)), np.asarray(blk.apply(params, x)),
        atol=0, rtol=0)

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

"""Ring attention: sequence-parallel exact attention over the ICI ring.

The reference has no long-context machinery at all (SURVEY §5.7 — it caps
sequence lengths in the datasets instead). For the TPU framework this is the
first-class sequence-sharding hook: shard the sequence axis of q/k/v over a
mesh axis, keep q local, and rotate k/v blocks around the ring with
`lax.ppermute` while accumulating streaming-softmax (flash-style) partials.
Each hop overlaps a block of attention compute with one neighbor transfer on
ICI; memory per chip is O(T/n · T/n) scores instead of O(T²).

Use under shard_map:

    mesh = Mesh(devices, ("sp",))
    out = shard_map(
        functools.partial(ring_attention, axis_name="sp", axis_size=n, causal=True),
        mesh=mesh,
        in_specs=(P(None, "sp", None, None),) * 3,
        out_specs=P(None, "sp", None, None),
    )(q, k, v)
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    axis_size: int,
    causal: bool = False,
    scale: Optional[float] = None,
    bias_strip: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-shard bodies get local blocks q/k/v: (B, T_local, H, D).

    Returns the exact attention output for the local query block against the
    FULL (global) key/value sequence.

    `bias_strip` (H, 2·T_global−1), replicated: a Toeplitz relative-position
    bias in strip form — bias[h, i, j] = strip[h, j−i+T_global−1], the same
    form the Pallas flash kernel consumes (models/diffusion_net.py
    RelativePositionBias.strip). Added to the SCALED scores, matching the
    AttentionBlock einsum convention; each ring hop gathers only its local
    (Tq, Tk) window of diagonals, so the full (T, T) bias never materializes.
    """
    b, t_local, h, d = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    my_idx = lax.axis_index(axis_name)

    q_pos = my_idx * t_local + jnp.arange(t_local)  # global query positions
    t_global = axis_size * t_local

    # masked scores are -inf (NOT finfo.min) so the fully-masked-block guards
    # below — jnp.isfinite — actually distinguish masked from valid entries
    neg = -jnp.inf

    def block(scores_carry, step):
        """One ring hop: attend to the k/v block currently held, then pass it
        to the next device."""
        acc, m, l, k_cur, v_cur = scores_carry
        # the block we hold at `step` originated at device (my_idx - step) % n
        src = (my_idx - step) % axis_size
        k_pos = src * t_local + jnp.arange(t_local)

        s = jnp.einsum("bqhd,bkhd->bhqk", q, k_cur).astype(jnp.float32) * scale
        if bias_strip is not None:
            rel = k_pos[None, :] - q_pos[:, None] + (t_global - 1)  # (Tq, Tk)
            s = s + bias_strip.astype(jnp.float32)[:, rel][None]
        if causal:
            mask = q_pos[:, None] >= k_pos[None, :]
            s = jnp.where(mask[None, None], s, neg)

        m_blk = jnp.max(s, axis=-1)  # (B,H,Tq)
        m_new = jnp.maximum(m, m_blk)
        # fully-masked rows: s - m_new = -inf - -inf = nan → zero them
        p = jnp.exp(s - m_new[..., None])
        p = jnp.where(jnp.isfinite(s), p, 0.0)
        corr = jnp.exp(m - m_new)
        corr = jnp.where(jnp.isfinite(m), corr, 0.0)
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_cur.astype(jnp.float32)
        )

        perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        return (acc, m_new, l_new, k_nxt, v_nxt), None

    # mark the initial accumulators as device-varying over the ring axis so
    # the scan carry types match (shard_map tracks varying manual axes)
    def _vary(x):
        return lax.pcast(x, axis_name, to="varying")
    acc0 = _vary(jnp.zeros((b, h, t_local, d), jnp.float32))
    m0 = _vary(jnp.full((b, h, t_local), neg, jnp.float32))
    l0 = _vary(jnp.zeros((b, h, t_local), jnp.float32))
    (acc, m, l, _, _), _ = lax.scan(
        block, (acc0, m0, l0, k, v), jnp.arange(axis_size)
    )
    out = acc / jnp.maximum(l[..., None], 1e-30)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)  # (B, Tq, H, D)


def make_ring_attention(mesh, axis_name: str = "sp", causal: bool = False,
                        with_bias: bool = False, scale: Optional[float] = None):
    """shard_map-wrapped ring attention over `axis_name` of `mesh`; inputs
    (B, T, H, D) with T divisible by the axis size. With `with_bias` the
    wrapped fn takes a fourth operand: the replicated (H, 2T−1) Toeplitz
    bias strip (see ring_attention)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n = mesh.shape[axis_name]
    spec = P(None, axis_name, None, None)
    if with_bias:
        fn = functools.partial(
            ring_attention, axis_name=axis_name, axis_size=n, causal=causal,
            scale=scale,
        )

        def with_strip(q, k, v, strip):
            return fn(q, k, v, bias_strip=strip)

        return shard_map(with_strip, mesh=mesh,
                         in_specs=(spec, spec, spec, P(None, None)),
                         out_specs=spec)
    fn = functools.partial(
        ring_attention, axis_name=axis_name, axis_size=n, causal=causal,
        scale=scale,
    )
    return shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)

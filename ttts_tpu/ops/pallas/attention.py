"""Fused attention (Pallas TPU kernel) for the diffusion trunk / GPT prefill.

The AA_diffusion trunk runs 9 rel-pos attention blocks per denoiser forward ×
50 DPM++ steps (utils.AttentionBlock:172-215 semantics); the naive XLA path
materializes (B, H, T, T) score tensors in HBM every call. This kernel tiles
queries (blk rows at a time), keeps the K/V panels for ALL heads of one batch
row in VMEM, and loops heads inside the program — scores never leave VMEM and
q/k/v are touched exactly once in HBM.

The rel-pos bias matrix is Toeplitz — bias[h, i, j] = strip[h, j−i+T−1] where
strip is the (H, 2T−1) diagonal table (models/diffusion_net.py
RelativePositionBias). The kernel slices the per-block diagonal window
(lane-aligned) and materializes the (blk, T) tile with Mosaic's strided
rotate — no (T, T) bias tensor exists anywhere.

Constraints: T % blk == 0 (callers' shape buckets are multiples of 128);
K/V panels for one batch row must fit VMEM (T·H·D ≲ 2M elements). Forward
only — the sampling path never differentiates; training keeps the XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _toeplitz_tile(window: jax.Array, blk: int, t: int) -> jax.Array:
    """window (L,) with L = t+blk → tile (blk, t), tile[r, j] = window[j−r+blk−1].

    Mosaic's strided rotate (tpu.dynamic_rotate) shifts each sublane by one
    extra lane: row r gets the window left-rotated by blk−1−r, which is
    exactly the Toeplitz alignment. No reshape/gather, all lanes stay
    aligned (L is a multiple of 128 for the callers' shapes)."""
    l = window.shape[0]
    b = jnp.broadcast_to(window, (blk, l))
    rolled = pltpu.roll(b, l - blk + 1, 1, stride=1, stride_axis=0)
    return rolled[:, :t]


def _flash_kernel(q_ref, k_ref, v_ref, strip_ref, o_ref, *, scale: float,
                  t: int, blk: int, heads: int, causal: bool, has_bias: bool):
    i0 = pl.program_id(1) * blk

    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (blk, t), 0) + i0
        cols = jax.lax.broadcasted_iota(jnp.int32, (blk, t), 1)
        causal_mask = cols <= rows

    if has_bias:
        # diagonal window for rows [i0, i0+blk): strip indices
        # j − (i0+r) + T − 1 ∈ [T−blk−i0, 2T−2−i0]; the start is a multiple
        # of blk (T ≡ 0 mod blk), so the slice stays lane-aligned.
        start = pl.multiple_of(t - blk - i0, blk)
        windows = strip_ref[:, pl.ds(start, t + blk)]  # (H, L)

    for h in range(heads):  # unrolled; all heads share this program's panels
        q = q_ref[0, h]  # (blk, D)
        k = k_ref[0, h]  # (T, D)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if has_bias:
            s = s + _toeplitz_tile(windows[h], blk, t)
        if causal:
            s = jnp.where(causal_mask, s, jnp.finfo(jnp.float32).min)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, h]
        o_ref[0, h] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "blk", "interpret"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    strip: jax.Array | None = None,
    scale: float | None = None,
    causal: bool = False,
    blk: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """q, k, v: (B, T, H, D); strip: (H, 2T−1) additive Toeplitz bias or None.
    Returns (B, T, H, D). Requires T % blk == 0."""
    b, t, h, d = q.shape
    assert t % blk == 0, f"T={t} must be a multiple of blk={blk}"
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    # XLA promotes custom-call results/operands into scoped VMEM; past the
    # ~16 MB scoped limit that promotion fails AT COMPILE TIME (observed at
    # B=8, T=1024, H=16, D=32: "scoped allocation 36.00M exceeded limit
    # 16.00M"). Batch rows are independent, so run oversize batches through
    # a lax.map over row chunks — the loop's dynamic-update-slice keeps one
    # HBM output buffer and only a small chunk ever lives in scoped VMEM
    # (a python-loop + concatenate variant still OOM'd: all chunk results
    # were co-resident for the concat).
    row_bytes = t * h * d * 4
    rows_per_call = max(1, (3 * 1024 * 1024) // row_bytes)
    if b > rows_per_call:
        rpc = 1 << (rows_per_call.bit_length() - 1)  # pow2 so it divides b
        if b % rpc == 0:
            qs = q.reshape(b // rpc, rpc, t, h, d)
            ks = k.reshape(b // rpc, rpc, t, h, d)
            vs = v.reshape(b // rpc, rpc, t, h, d)
            out = jax.lax.map(
                lambda args: flash_attention(
                    args[0], args[1], args[2], strip=strip, scale=scale,
                    causal=causal, blk=blk, interpret=interpret),
                (qs, ks, vs),
            )
            return out.reshape(b, t, h, d)
        outs = [
            flash_attention(q[i : i + rpc], k[i : i + rpc], v[i : i + rpc],
                            strip=strip, scale=scale, causal=causal, blk=blk,
                            interpret=interpret)
            for i in range(0, b, rpc)
        ]
        return jnp.concatenate(outs, axis=0)

    has_bias = strip is not None
    # (B, H, T, D) layout: heads ride the leading dims so per-head reads and
    # writes inside the kernel stay plain last-two-dim slices
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    inputs = [qt, kt, vt]
    in_specs = [
        pl.BlockSpec((1, h, blk, d), lambda bb, ii: (bb, 0, ii, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, t, d), lambda bb, ii: (bb, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, t, d), lambda bb, ii: (bb, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        # pad so every block's (t+blk)-wide window stays in bounds
        pad = 2 * t + blk - strip.shape[1]
        strip_p = jnp.pad(strip, ((0, 0), (0, pad))).astype(jnp.float32)
        inputs.append(strip_p)
        in_specs.append(
            pl.BlockSpec(strip_p.shape, lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _flash_kernel if has_bias else _flash_kernel_nobias,
        scale=scale, t=t, blk=blk, heads=h, causal=causal, has_bias=has_bias,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, t // blk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, blk, d), lambda bb, ii: (bb, 0, ii, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        interpret=interpret,
    )(*inputs)
    return jnp.transpose(out, (0, 2, 1, 3))


def _flash_kernel_nobias(q_ref, k_ref, v_ref, o_ref, **kw):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, **kw)

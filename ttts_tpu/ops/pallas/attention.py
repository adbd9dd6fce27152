"""Fused attention (Pallas TPU kernel) for the diffusion trunk / GPT prefill.

The AA_diffusion trunk runs 9 rel-pos attention blocks per denoiser forward ×
50 DPM++ steps (utils.AttentionBlock:172-215 semantics); the naive XLA path
materializes (B, H, T, T) score tensors in HBM every call. This kernel tiles
queries (blk rows at a time) over a (batch, head, query-block) grid, keeps
one head's (T, D) K/V panels in VMEM per program — scores never leave VMEM
and q/k/v are touched exactly once per (batch, head) in HBM.

The rel-pos bias matrix is Toeplitz — bias[h, i, j] = strip[h, j−i+T−1] where
strip is the (H, 2T−1) diagonal table (models/diffusion_net.py
RelativePositionBias). The kernel slices the per-block diagonal window
(lane-aligned) and materializes the (blk, T) tile with Mosaic's strided
rotate — no (T, T) bias tensor exists anywhere.

Constraints: T % blk == 0 (callers' shape buckets are multiples of 128);
the (blk, T) f32 score tile plus two (blk, T+blk) Toeplitz temporaries must
fit the 16 MiB scoped-VMEM stack (T ≲ 8k at blk=128). Forward only — the
sampling path never differentiates; training keeps the XLA path.
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
                  t: int, blk: int, causal: bool, has_bias: bool):
    """One (batch row, head, query block) program.

    Heads ride the GRID, not a Python loop: an unrolled in-kernel head loop
    keeps every head's (blk, T) f32 score tile live on the Mosaic stack at
    once (16 heads × blk=256 × T=768 blew the 16 MiB scoped-VMEM limit by
    0.5 M), whereas one-head programs keep exactly one. K/V panels are
    (T, D) per program and Mosaic's pipeline skips the re-fetch while the
    head index is unchanged."""
    i0 = pl.program_id(2) * blk

    q = q_ref[0, 0]  # (blk, D)
    k = k_ref[0, 0]  # (T, D)
    # fold the softmax scale into the (blk, D) q tile — T/D ≈ 24× fewer
    # multiplies than scaling the (blk, T) score tile (costs one bf16
    # rounding of q, same as the einsum path's q·dk^-¼ pre-scaling)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    if has_bias:
        # diagonal window for rows [i0, i0+blk): strip indices
        # j − (i0+r) + T − 1 ∈ [T−blk−i0, 2T−2−i0]; the start is a multiple
        # of blk (T ≡ 0 mod blk), so the slice stays lane-aligned.
        start = pl.multiple_of(t - blk - i0, blk)
        window = strip_ref[0, 0, pl.ds(start, t + blk)]  # (L,)
        s = s + _toeplitz_tile(window, blk, t)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (blk, t), 0) + i0
        cols = jax.lax.broadcasted_iota(jnp.int32, (blk, t), 1)
        s = jnp.where(cols <= rows, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0, 0]
    # normalize AFTER the PV dot: divide the (blk, D) output instead of
    # the (blk, T) probabilities — T/D ≈ 24× fewer VPU divides at the
    # trunk shape; measured 0.513 → 0.330 ms at (8, 768, 16, 32)
    # (scripts/bench_trunk_attention.py), identical to bf16 rounding.
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / denom).astype(o_ref.dtype)


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
    blk: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """q, k, v: (B, T, H, D); strip: (H, 2T−1) additive Toeplitz bias or None.
    Returns (B, T, H, D). Requires T % blk == 0 and blk % 128 == 0 (the
    strip window slice must stay lane-aligned; 448 fails Mosaic's proof).

    blk=None → the largest of (512, 384, 256, 128) dividing T whose
    (blk, T) f32 score tile + two Toeplitz temporaries stay under the
    scoped-VMEM stack (blk·T ≤ 2^20). Round-5 amort-64 sweep on v5e at the
    trunk shape (B=8, H=16, D=32): T=768 → 0.369 ms at blk=384 vs 0.538 at
    128 / 0.415 at 256 / 0.525 at 768; T=1024 → 0.519 at blk=512 vs 0.899
    at 128. Fewer, fatter programs win — per-program pipeline overhead
    dominates below ~384 rows. (An earlier round-4 sweep of a different
    kernel revision preferred 128; re-sweep after kernel changes.)
    T=896-class lengths only divide by 128 (448 fails Mosaic's proof) and
    stay on blk=128."""
    b, t, h, d = q.shape
    if blk is None:
        blk = next((c for c in (512, 384, 256, 128)
                    if t % c == 0 and c * t <= 1 << 20), 128)
    assert t % blk == 0, f"T={t} must be a multiple of blk={blk}"
    assert blk % 128 == 0, (
        f"blk={blk} must be a multiple of 128 — the Toeplitz strip window "
        "slice must stay lane-aligned (blk=64/448 fail Mosaic's proof with "
        "an opaque lowering error)")
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    has_bias = strip is not None
    # (B, H, T, D) layout: heads ride the leading dims so per-head reads and
    # writes inside the kernel stay plain last-two-dim slices
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    inputs = [qt, kt, vt]
    # grid = (batch, head, query block): per-program VMEM is one head's
    # (T, D) K/V panels + one (blk, T) f32 score tile, so no batch chunking
    # or scoped-VMEM gymnastics are needed at any serving batch size (an
    # earlier all-heads-per-program layout needed a lax.map over row chunks
    # past B·T·H·D ≈ 3 M elements and still hit the 16 MiB stack limit at
    # blk=256 — see the kernel docstring).
    in_specs = [
        pl.BlockSpec((1, 1, blk, d), lambda bb, hh, ii: (bb, hh, ii, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, t, d), lambda bb, hh, ii: (bb, hh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, t, d), lambda bb, hh, ii: (bb, hh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        # pad so every block's (t+blk)-wide window stays in bounds; the
        # singleton middle axis makes the per-head block's trailing two dims
        # (1, L) legal under Mosaic's sublane rule (a (1, L) block of a
        # (H, L) array is not — block dim 1 of array dim 16 is neither a
        # multiple of 8 nor the full dim)
        pad = 2 * t + blk - strip.shape[1]
        strip_p = jnp.pad(strip, ((0, 0), (0, pad))).astype(jnp.float32)
        strip_p = strip_p[:, None, :]  # (H, 1, L)
        inputs.append(strip_p)
        in_specs.append(
            pl.BlockSpec((1, 1, strip_p.shape[2]),
                         lambda bb, hh, ii: (hh, 0, 0),
                         memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _flash_kernel if has_bias else _flash_kernel_nobias,
        scale=scale, t=t, blk=blk, causal=causal, has_bias=has_bias,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h, t // blk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, blk, d),
                               lambda bb, hh, ii: (bb, hh, ii, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        interpret=interpret,
    )(*inputs)
    return jnp.transpose(out, (0, 2, 1, 3))


def _flash_kernel_nobias(q_ref, k_ref, v_ref, o_ref, **kw):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, **kw)

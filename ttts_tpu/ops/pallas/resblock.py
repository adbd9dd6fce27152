"""Fused scale-shift ResBlock (Pallas TPU kernel) for the diffusion trunk.

The AA_diffusion denoiser runs 12 ScaleShiftResBlocks per forward × 50 DPM++
steps (aa_model.py:72-133 semantics, models/diffusion_net.py
ScaleShiftResBlock) — after the round-4 flash-attention win this chain is
~75% of the remaining step and bandwidth-bound: the XLA lowering streams the
(B, T, C) activation through HBM once per stage (GroupNorm stats, normalize+
affine, SiLU, 1×1 matmul, GroupNorm again, FiLM, SiLU, conv3, residual —
~8-10 HBM round-trips), while the MXU work (4 C×C matmuls) is tiny.

This kernel runs the WHOLE block per batch element in one program: the
(T, C) slab is read from HBM once, every stage happens in VMEM/registers,
and the result is written once — 2 HBM passes instead of ~10. GroupNorm
reductions need full-T statistics, which is exactly why XLA can't fuse this
chain itself (reduce→broadcast breaks its fusions) and why the grid is per
batch element rather than time-blocked.

Numerics match the XLA path: statistics and all element-wise math in f32
(flax GroupNorm upcasts internally), matmul inputs cast to the activation
dtype (bf16 on the serving path) with f32 accumulation — identical to
`nn.Dense(dtype=bf16)` / `nn.Conv(dtype=bf16)`.

Group statistics use the MXU instead of cross-lane reshapes: per-channel
sums (reduce over T) are grouped by a (C, G) one-hot matmul and broadcast
back with its transpose — Mosaic-friendly, and at (1, C)·(C, G) shapes the
cost is noise.

Forward only — the sampling path never differentiates; training keeps the
XLA path (same rule as ops/pallas/attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_matrices(channels: int, groups: int, dtype=jnp.float32):
    """(C, G) one-hot grouping matrix M: M[c, g] = 1 iff c // (C/G) == g."""
    cg = channels // groups
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (channels, groups), 0)
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (channels, groups), 1)
    return (c_idx // cg == g_idx).astype(dtype)


def _gn_normalize(h, m, mt, n_per_group, eps):
    """GroupNorm statistics of h (T, C) f32 via the grouping matmuls;
    returns (h - mean) * rsqrt(var + eps) with per-channel broadcasts."""
    s1 = jnp.sum(h, axis=0, keepdims=True)  # (1, C)
    s2 = jnp.sum(h * h, axis=0, keepdims=True)
    gmean = jnp.dot(s1, m, preferred_element_type=jnp.float32) / n_per_group
    gsq = jnp.dot(s2, m, preferred_element_type=jnp.float32) / n_per_group
    gvar = gsq - gmean * gmean
    mean_c = jnp.dot(gmean, mt, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(jax.lax.rsqrt(gvar + eps), mt,
                    preferred_element_type=jnp.float32)
    return (h - mean_c) * inv_c


def _shift_rows(h, direction: int):
    """h (T, C) → h shifted so row t holds h[t - direction], zero at the
    vacated edge ('SAME' conv padding)."""
    t = h.shape[0]
    rolled = pltpu.roll(h, direction % t, 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
    if direction > 0:  # row 0 would wrap from the end
        return jnp.where(rows < direction, 0.0, rolled)
    return jnp.where(rows >= t + direction, 0.0, rolled)


def _resblock_kernel(x_ref, g1_ref, b1_ref, w1_ref, bd1_ref, a2_ref, b2_ref,
                     w3_ref, bc3_ref, o_ref, *, groups: int, eps: float):
    xf = x_ref[0].astype(jnp.float32)  # (T, C)
    t, c = xf.shape
    m = _group_matrices(c, groups)
    mt = m.T
    n1 = jnp.float32(t * (c // groups))

    # GroupNorm_0 (own affine) → SiLU → 1×1 Dense. Row vectors arrive as
    # (1, 1, C) blocks (a bare (1, C) block trips the sublane-1 tiling rule);
    # ref[0] yields the broadcastable (1, C) row.
    h = _gn_normalize(xf, m, mt, n1, eps) * g1_ref[0] + b1_ref[0]
    h = h * jax.nn.sigmoid(h)
    h = jnp.dot(h.astype(w1_ref.dtype), w1_ref[...],
                preferred_element_type=jnp.float32) + bd1_ref[0]

    # GroupNorm_1 ⊗ FiLM: a2/b2 are the COMBINED per-(batch, channel) affine
    # γ·(1+scale) / β·(1+scale)+shift, precomputed outside (the emb path is a
    # (B, C) matmul — XLA territory). Then SiLU.
    h = _gn_normalize(h, m, mt, n1, eps) * a2_ref[0] + b2_ref[0]
    h = h * jax.nn.sigmoid(h)

    # conv3 'SAME' as three shifted matmuls: out[t] = Σ_k h[t+k−1] @ w3[k].
    # Rows are shifted while still f32 (Mosaic's dynamic_rotate has no
    # bf16 lowering: "Rotate with non-32-bit data"), then cast per operand.
    wdt = w3_ref.dtype
    y = jnp.dot(h.astype(wdt), w3_ref[1], preferred_element_type=jnp.float32)
    y = y + jnp.dot(_shift_rows(h, 1).astype(wdt), w3_ref[0],
                    preferred_element_type=jnp.float32)
    y = y + jnp.dot(_shift_rows(h, -1).astype(wdt), w3_ref[2],
                    preferred_element_type=jnp.float32)
    y = y + bc3_ref[0]

    o_ref[0] = (xf + y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def fused_scale_shift_resblock(
    x: jax.Array,       # (B, T, C) activation (bf16 on the serving path)
    g1: jax.Array,      # (C,) GroupNorm_0 scale (f32)
    b1: jax.Array,      # (C,) GroupNorm_0 bias
    w1: jax.Array,      # (C, C) 1×1 Dense kernel
    bd1: jax.Array,     # (C,) Dense bias
    a2: jax.Array,      # (B, C) combined GN_1×FiLM scale  γ·(1+s)
    b2: jax.Array,      # (B, C) combined GN_1×FiLM shift  β·(1+s)+sh
    w3: jax.Array,      # (3, C, C) conv kernel (flax layout: k, in, out)
    bc3: jax.Array,     # (C,) conv bias
    groups: int = 32,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """One ScaleShiftResBlock forward, fused: x + conv3(silu(film(gn(
    dense(silu(gn(x)·γ1+β1)))))). See module docstring for layout/numerics.

    Constraints: C % groups == 0, C % 128 == 0 (lane-aligned), T % 8 == 0
    (sublane-aligned), and the per-program f32 working set (~5 (T, C) slabs
    + 2 MB of weights) must fit the 16 MiB scoped-VMEM stack — callers gate
    on T ≤ ~1536 at C=512 and fall back to the XLA path above."""
    b, t, c = x.shape
    assert c % groups == 0 and c % 128 == 0, (c, groups)
    assert t % 8 == 0, t
    f32 = jnp.float32
    wdt = x.dtype
    row = lambda v: v.reshape(1, 1, c).astype(f32)

    grid = (b,)
    kernel = functools.partial(_resblock_kernel, groups=groups, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),            # x
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0)),            # g1
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0)),            # b1
            pl.BlockSpec((c, c), lambda i: (0, 0)),                  # w1
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0)),            # bd1
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),            # a2
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),            # b2
            pl.BlockSpec((3, c, c), lambda i: (0, 0, 0)),            # w3
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0)),            # bc3
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x,
        row(g1), row(b1),
        w1.astype(wdt), row(bd1),
        a2.reshape(b, 1, c).astype(f32), b2.reshape(b, 1, c).astype(f32),
        w3.astype(wdt), row(bc3),
    )


def resblock_reference(x, g1, b1, w1, bd1, a2, b2, w3, bc3,
                       groups: int = 32, eps: float = 1e-5):
    """Pure-XLA reference with the SAME operand layout as the kernel (the
    flax module remains the ground truth; this exists for kernel tests)."""
    f32 = jnp.float32
    xf = x.astype(f32)
    b, t, c = xf.shape

    def gn(h):
        g = h.reshape(b, t, groups, c // groups)
        mean = g.mean(axis=(1, 3), keepdims=True)
        var = g.var(axis=(1, 3), keepdims=True)
        return ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, c)

    h = gn(xf) * g1.astype(f32) + b1.astype(f32)
    h = jax.nn.silu(h)
    h = jnp.dot(h.astype(x.dtype), w1.astype(x.dtype),
                preferred_element_type=f32) + bd1.astype(f32)
    h = gn(h) * a2.astype(f32)[:, None, :] + b2.astype(f32)[:, None, :]
    h = jax.nn.silu(h)
    hb = h.astype(x.dtype)
    w3c = w3.astype(x.dtype)
    pad = jnp.zeros((b, 1, c), x.dtype)
    y = jnp.dot(hb, w3c[1], preferred_element_type=f32)
    y = y + jnp.dot(jnp.concatenate([pad, hb[:, :-1]], axis=1), w3c[0],
                    preferred_element_type=f32)
    y = y + jnp.dot(jnp.concatenate([hb[:, 1:], pad], axis=1), w3c[2],
                    preferred_element_type=f32)
    return (xf + y + bc3.astype(f32)).astype(x.dtype)


def _gn_qkv_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *,
                   groups: int, eps: float):
    # program (b, j): GN-normalize the x slab (re-fetched for free — the x
    # block's index map is constant in j, so Mosaic skips the DMA; the stats
    # recompute is two cheap reduce passes), then produce one C-wide column
    # block of the (T, 3C) projection. Column blocking keeps the live f32
    # product at (T, C) — a single (T, 3C) f32 product blew the 16 MiB
    # scoped-VMEM stack by 452 K at the serving shape.
    xf = x_ref[0].astype(jnp.float32)  # (T, C)
    t, c = xf.shape
    m = _group_matrices(c, groups)
    h = _gn_normalize(xf, m, m.T, jnp.float32(t * (c // groups)), eps)
    h = h * g_ref[0] + b_ref[0]
    o_ref[0] = (jnp.dot(h.astype(w_ref.dtype), w_ref[...],
                        preferred_element_type=jnp.float32)
                + bias_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def fused_gn_qkv(
    x: jax.Array,      # (B, T, C)
    g: jax.Array,      # (C,) GroupNorm scale
    b: jax.Array,      # (C,) GroupNorm bias
    w: jax.Array,      # (C, K) qkv projection kernel (K = 3C)
    bias: jax.Array,   # (K,)
    groups: int = 32,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """GroupNorm → 1×1 projection in one HBM pass — the producer half of the
    trunk AttentionBlock (models/diffusion_net.py:207-214, the
    `qkv(norm(x))` chain; utils.AttentionBlock:172-215 in the reference).
    The XLA lowering runs the GN reduce as its own kernel and streams the
    (B, T, C) slab twice; here the normalize feeds the MXU from VMEM.
    Returns (B, T, K) in x.dtype. Same constraints as the resblock kernel."""
    B, t, c = x.shape
    k = w.shape[1]
    assert c % groups == 0 and c % 128 == 0, (c, groups)
    assert t % 8 == 0, t
    assert k % c == 0, (k, c)  # column blocks are C wide (3 for qkv)
    row = lambda v, n: v.reshape(1, 1, n).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_gn_qkv_kernel, groups=groups, eps=eps),
        grid=(B, k // c),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((B, t, k), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, row(g, c), row(b, c), w.astype(x.dtype), row(bias, k))

"""Fused single-token decode attention for the AR serving loop (Pallas TPU).

The reference serves GPT decode through HF `generate` + torch SDPA over a
growing KV cache (ttts/gpt/model.py:77-185). Our jitted `lax.while_loop`
decode (models/gpt.py inference_speech) is bandwidth-bound: each step must
(a) append one K/V row per layer and (b) read the whole cache back for
attention. Done as XLA ops this costs three full passes over the cache per
step (dynamic_update_slice copy hazards + QK^T read + PV read, each a
separate HBM round trip through fusion boundaries). This kernel fuses the
row update, QK^T, online softmax, and PV into ONE pass with manual DMA:

  * caches live in HBM (``memory_space=pltpu.HBM``) and are aliased in→out,
    so the per-step row update is a single ~16 KB DMA, not an O(cache) copy;
  * K/V stream through double-buffered VMEM scratch, one ``blk``-row panel
    ahead of compute (``make_async_copy`` + per-slot DMA semaphores);
  * the softmax is the usual online (m, z, acc) recurrence in f32 scratch,
    finalized on the last grid step.

Measured on v5e at (B=16, H=8, DK=64, max_len=512, 6 layers): 93 µs/step vs
478 µs for the XLA einsum formulation — 5.1×, and within ~1.5× of the pure
cache-read speed of light (≈63 µs at 819 GB/s).

Layout contract — caches are TIME-major and lane-packed: ``(max_len, DK,
H*B)`` with the (head, batch) pair flattened HEAD-major into the minor dim.
Two hardware reasons:

  * time-major puts the per-step row update on a CONTIGUOUS row, which is
    the only form Mosaic can express as a sliced HBM DMA (and the only form
    XLA's in-place dynamic_update_slice pass handles without a full-cache
    round trip — measured 340 µs/step of pure copy for the batch-major
    layout at the same shape);
  * the minor dim must be a multiple of 128 (the TPU lane width): Mosaic
    tiles HBM memrefs, and a sliced DMA needs a lane-aligned minor dim. DK
    as the minor dim (64) would be padded to 128 and become unsliceable,
    so DK sits in the sublane dim and (H*B) in lanes. HEAD-major flattening
    keeps tensor-parallel head sharding a contiguous chunk of the minor dim.

Eligibility (checked by :func:`decode_attention`, which otherwise falls back
to :func:`decode_attention_reference` — numerically the same computation):
TPU backend, ``H*B % 128 == 0``, ``DK % 16 == 0``, and some block size in
{128, 64, 32} divides ``max_len`` with the double-buffered panels fitting
the scoped-VMEM budget.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "decode_attention",
    "decode_attention_reference",
    "decode_attention_spmd",
    "fused_decode_attention",
]

# budget for the two double-buffered K/V panels. The binding constraint is
# XLA's SCOPED vmem limit (16 MiB on v5e, measured: a 16.06M allocation was
# rejected), not the 128 MiB physical VMEM — leave headroom for the q/u
# blocks, f32 accumulators and compiler spills.
_VMEM_PANEL_BUDGET_BYTES = 12 * 1024 * 1024


def _kernel(pos_ref, q_ref, uk_ref, uv_ref, k_hbm, v_hbm,
            o_ref, ko_hbm, vo_hbm,
            kbuf, vbuf, m_scr, z_scr, acc_scr, usem, ksem, vsem,
            *, blk, scale):
    del k_hbm, v_hbm  # aliased to ko_hbm / vo_hbm; only the outputs are used
    j = pl.program_id(0)
    nb = pl.num_programs(0)
    pos = pos_ref[0]

    def k_copy(jj, slot):
        return pltpu.make_async_copy(
            ko_hbm.at[pl.ds(jj * blk, blk)],
            kbuf.at[pl.ds(slot * blk, blk)], ksem.at[slot])

    def v_copy(jj, slot):
        return pltpu.make_async_copy(
            vo_hbm.at[pl.ds(jj * blk, blk)],
            vbuf.at[pl.ds(slot * blk, blk)], vsem.at[slot])

    @pl.when(j == 0)
    def _first():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        z_scr[...] = jnp.zeros_like(z_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        # write the step's new K/V row in place FIRST (the row at `pos` must
        # be visible to the panel reads below when pos lands in any panel),
        # then start the block-0 reads.
        ku = pltpu.make_async_copy(uk_ref, ko_hbm.at[pl.ds(pos, 1)], usem)
        vu = pltpu.make_async_copy(uv_ref, vo_hbm.at[pl.ds(pos, 1)], usem)
        ku.start()
        vu.start()
        ku.wait()
        vu.wait()
        k_copy(0, 0).start()
        v_copy(0, 0).start()

    # Panels wholly beyond `pos` hold only masked rows — skip their DMA and
    # compute entirely (reads scale with the LIVE prefix, not max_len; at a
    # mid-generation pos this is ~40% of the cache bandwidth). Start/wait
    # predicates are identical (`j*blk <= pos` for panel j), so every started
    # copy is waited exactly once.
    @pl.when((j + 1 < nb) & ((j + 1) * blk <= pos))
    def _prefetch():
        k_copy(j + 1, (j + 1) % 2).start()
        v_copy(j + 1, (j + 1) % 2).start()

    @pl.when(j * blk <= pos)
    def _compute():
        k_copy(j, j % 2).wait()
        v_copy(j, j % 2).wait()

        kb = kbuf[pl.ds((j % 2) * blk, blk)].astype(jnp.float32)  # (blk,dk,bh)
        q = q_ref[...].astype(jnp.float32)                        # (dk, bh)
        s = jnp.sum(kb * q[None], axis=1) * scale                 # (blk, bh)
        rows = j * blk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(rows <= pos, s, -jnp.inf)

        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)                           # (1, bh)
        p = jnp.exp(s - m_new)
        z_scr[...] = z_scr[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
        vb = vbuf[pl.ds((j % 2) * blk, blk)].astype(jnp.float32)
        pv = jnp.sum(p[:, None, :] * vb, axis=0)                  # (dk, bh)
        acc_scr[...] = acc_scr[...] * alpha + pv
        m_scr[...] = m_new

    @pl.when(j == nb - 1)
    def _fin():
        o_ref[...] = (acc_scr[...] / z_scr[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk",))
def fused_decode_attention(q, uk, uv, k_cache, v_cache, pos, *, blk=128):
    """One decode-attention step, caches updated IN PLACE (donated).

    q: (DK, BH) query for the new token; uk/uv: (1, DK, BH) the new K/V row;
    k_cache/v_cache: (max_len, DK, BH) time-major; pos: scalar int32 row to
    write (rows > pos are masked out of the softmax).
    Returns (out (DK, BH), k_cache', v_cache').
    """
    ml, dk, bh = k_cache.shape
    if ml % blk:
        raise ValueError(f"max_len {ml} must be a multiple of blk {blk}")
    nb = ml // blk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((dk, bh), lambda j, pr: (0, 0)),
            pl.BlockSpec((1, dk, bh), lambda j, pr: (0, 0, 0)),
            pl.BlockSpec((1, dk, bh), lambda j, pr: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((dk, bh), lambda j, pr: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * blk, dk, bh), k_cache.dtype),
            pltpu.VMEM((2 * blk, dk, bh), v_cache.dtype),
            pltpu.VMEM((1, bh), jnp.float32),
            pltpu.VMEM((1, bh), jnp.float32),
            pltpu.VMEM((dk, bh), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, kc, vc = pl.pallas_call(
        functools.partial(_kernel, blk=blk, scale=1.0 / math.sqrt(dk)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},
    )(jnp.asarray(pos, jnp.int32).reshape(1), q, uk, uv, k_cache, v_cache)
    return out, kc, vc


def decode_attention_reference(q, uk, uv, k_cache, v_cache, pos):
    """XLA formulation of the same step on the same packed layout.

    Used on CPU (tests, virtual-mesh dryruns) and for ineligible shapes;
    GSPMD shards it like any einsum, so the tensor-parallel decode path
    routes here under a mesh.
    """
    ml, dk, _ = k_cache.shape
    kc = jax.lax.dynamic_update_slice_in_dim(k_cache, uk, pos, axis=0)
    vc = jax.lax.dynamic_update_slice_in_dim(v_cache, uv, pos, axis=0)
    s = jnp.einsum("mdx,dx->mx", kc.astype(jnp.float32),
                   q.astype(jnp.float32)) / math.sqrt(dk)
    s = jnp.where((jnp.arange(ml) <= pos)[:, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=0)
    out = jnp.einsum("mx,mdx->dx", p, vc.astype(jnp.float32))
    return out.astype(q.dtype), kc, vc


def _pick_blk(ml: int, dk: int, bh: int, itemsize: int, blk: int):
    """Largest block ≤ `blk` whose double-buffered K+V panels fit the scoped
    VMEM budget and divide max_len; None if no candidate works."""
    cand = blk
    while cand >= 32:
        panel_bytes = 2 * (2 * cand) * dk * bh * itemsize
        if ml % cand == 0 and panel_bytes <= _VMEM_PANEL_BUDGET_BYTES:
            return cand
        cand //= 2
    return None


def _eligible(ml: int, dk: int, bh: int, itemsize: int, blk: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if bh % 128 or dk % 16:
        return False
    return _pick_blk(ml, dk, bh, itemsize, blk) is not None


def decode_attention(q, uk, uv, k_cache, v_cache, pos, *, blk=128):
    """Dispatch: fused kernel when the shape qualifies, XLA otherwise."""
    ml, dk, bh = k_cache.shape
    itemsize = jnp.dtype(k_cache.dtype).itemsize
    if jax.default_backend() == "tpu" and bh % 128 == 0 and dk % 16 == 0:
        chosen = _pick_blk(ml, dk, bh, itemsize, blk)
        if chosen is not None:
            return fused_decode_attention(
                q, uk, uv, k_cache, v_cache, pos, blk=chosen)
    return decode_attention_reference(q, uk, uv, k_cache, v_cache, pos)


# ---------------------------------------------------------------------------
# GSPMD/Shardy partitioning: fused decode under a device mesh
# ---------------------------------------------------------------------------
#
# A manual-DMA pallas_call has no partitioning rule, so a bare
# fused_decode_attention under a GSPMD mesh forces a full all-gather (or an
# error). The packed cache layout was designed for exactly this moment: the
# minor dim flattens (head, batch) HEAD-major, so tensor-parallel HEAD
# sharding is a CONTIGUOUS chunk of the minor dim — i.e. plain dim-sharding
# the partitioner can express. decode_attention_spmd registers that rule via
# jax.experimental.custom_partitioning: every operand/result may shard ONLY
# along the packed bh dim (factor `x` below); time, head_dim, and pos must
# replicate. Each shard then runs the ordinary dispatcher on its LOCAL
# (ml, dk, bh/n) block — the fused kernel when the local shape still
# qualifies (bh/n a lane multiple; the serving loop pads the batch for the
# shard count, models/gpt.py inference_speech), the XLA formulation
# otherwise. Per-(head,batch) columns are independent, so no collective is
# needed inside the op.


def _spmd_lower(pos, q, uk, uv, kc, vc):
    out, k2, v2 = decode_attention(q, uk, uv, kc, vc, pos[0])
    return out, k2, v2


def _spmd_partition(mesh, arg_shapes, result_shape):
    # On the Shardy path the sharding_rule below already constrains every
    # factor except the packed bh dim to replicate. On the GSPMD path,
    # however, infer_sharding_from_operands only pins RESULTS — an operand
    # arriving sharded along time/dk would run the per-shard body on a
    # timeline fragment against the global pos and return silently wrong
    # attention. So rewrite the shardings here instead of passing them
    # through: keep only the minor (bh) dim's axis, replicate everything
    # else (pos fully replicated).
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fix(shaped, keep_minor):
        sh = shaped.sharding
        m = getattr(sh, "mesh", mesh)
        spec = getattr(sh, "spec", None)
        nd = len(shaped.shape)
        minor = (spec[nd - 1] if keep_minor and spec is not None
                 and len(spec) >= nd else None)
        return NamedSharding(m, P(*([None] * (nd - 1) + [minor])))

    pos, *tensors = arg_shapes
    arg_shardings = (fix(pos, False),) + tuple(fix(t, True) for t in tensors)
    result_shardings = jax.tree.map(lambda x: fix(x, True), result_shape)
    return mesh, _spmd_lower, result_shardings, arg_shardings


def _spmd_infer(mesh, arg_shapes, result_shape):
    # GSPMD (non-shardy) path: results inherit the caches' minor-dim sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    kc_sh = arg_shapes[4].sharding
    spec = getattr(kc_sh, "spec", None)
    x = spec[2] if spec is not None and len(spec) > 2 else None
    m = getattr(kc_sh, "mesh", mesh)
    return (NamedSharding(m, P(None, x)),
            NamedSharding(m, P(None, None, x)),
            NamedSharding(m, P(None, None, x)))


from jax.experimental.custom_partitioning import (  # noqa: E402
    custom_partitioning as _custom_partitioning,
)

_decode_attention_spmd = _custom_partitioning(_spmd_lower)
_decode_attention_spmd.def_partition(
    _spmd_partition,
    infer_sharding_from_operands=_spmd_infer,
    # p: pos row; u/w: the singleton update-row dims; m/n: cache time; d:
    # head_dim; x: packed head*batch — the ONLY shardable factor
    sharding_rule="p, d x, u d x, w d x, m d x, n d x -> d x, m d x, n d x",
    need_replication_factors=("p", "d", "u", "w", "m", "n"),
)


def decode_attention_spmd(q, uk, uv, k_cache, v_cache, pos):
    """decode_attention with a mesh partitioning rule (shard along the packed
    head-major bh dim only). Use for serving under a GSPMD mesh; numerically
    identical to decode_attention / decode_attention_reference."""
    pos = jnp.asarray(pos, jnp.int32).reshape(1)
    return _decode_attention_spmd(pos, q, uk, uv, k_cache, v_cache)

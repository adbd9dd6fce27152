"""Fused VQ codebook nearest-neighbour search (Pallas TPU kernel).

The codec quantizer's hot op (reference: EuclideanCodebook.quantize,
ttts/vqvae/core_vq.py:175-185 — ‖x‖² − 2xWᵀ + ‖W‖² then argmin; the driver
north star names this as a Pallas fusion target). The naive XLA lowering
materializes the (N, bins) distance matrix in HBM; this kernel tiles x-rows ×
codebook blocks, keeps the score tile in VMEM, runs the −2xWᵀ contraction on
the MXU, and maintains a running (min, argmin) per row in scratch — the
distance matrix never leaves the chip.

Tie-breaking matches jnp.argmin (first minimal index): codebook tiles are
visited in ascending order and updates use strict '<'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _vq_nn_kernel(x_ref, cb_ref, idx_ref, best_ref, besti_ref, *, tile_b: int):
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        besti_ref[:] = jnp.zeros_like(besti_ref)

    x = x_ref[:]  # (TN, D)
    cb = cb_ref[:]  # (TB, D)
    # squared distances; ‖x‖² is constant per row — drop it (argmin-invariant)
    scores = -2.0 * jnp.dot(x, cb.T, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    scores = scores + jnp.sum(cb * cb, axis=1)[None, :]

    row_min = jnp.min(scores, axis=1, keepdims=True)  # (TN, 1)
    row_arg = jnp.argmin(scores, axis=1).astype(jnp.int32)[:, None] + j * tile_b

    improved = row_min < best_ref[:]
    best_ref[:] = jnp.where(improved, row_min, best_ref[:])
    besti_ref[:] = jnp.where(improved, row_arg, besti_ref[:])

    @pl.when(j == nb - 1)
    def _():
        idx_ref[:] = besti_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_b"))
def vq_nearest_pallas(x: jax.Array, codebook: jax.Array, tile_n: int = 256,
                      tile_b: int = 256) -> jax.Array:
    """x: (N, D), codebook: (bins, D) → argmin indices (N,) int32."""
    n, d = x.shape
    bins = codebook.shape[0]
    dp = _round_up(d, 128)
    np_ = _round_up(n, tile_n)
    bp = _round_up(bins, tile_b)
    xp = jnp.pad(x.astype(jnp.float32), ((0, np_ - n), (0, dp - d)))
    # pad codebook rows with +inf-ish distance: give padded rows huge norm
    cbp = jnp.pad(codebook.astype(jnp.float32), ((0, bp - bins), (0, dp - d)))
    if bp != bins:
        # padded rows: one large component → ‖W‖²≈1e12 dominates, never selected
        pad_flag = jnp.zeros((bp,)).at[bins:].set(1e6)
        cbp = cbp.at[:, 0].add(pad_flag)

    grid = (np_ // tile_n, bp // tile_b)
    idx = pl.pallas_call(
        functools.partial(_vq_nn_kernel, tile_b=tile_b),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.int32),
        ],
    )(xp, cbp)
    return idx[:n, 0]


def vq_nearest_reference(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Plain XLA path (used on CPU and as the parity oracle)."""
    dist = (
        jnp.sum(x**2, axis=1, keepdims=True)
        - 2.0 * jnp.dot(x, codebook.T, preferred_element_type=jnp.float32,
                        precision="float32")
        + jnp.sum(codebook**2, axis=1)[None, :]
    )
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)

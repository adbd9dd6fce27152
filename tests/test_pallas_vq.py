"""Pallas VQ nearest-neighbour kernel parity (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ttts_tpu.ops.pallas import vq as vq_mod
from ttts_tpu.ops.pallas.vq import vq_nearest_reference


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas_call in interpreter mode (CPU tests; compiled on TPU)."""
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


@pytest.mark.parametrize("n,d,bins", [(100, 192, 1024), (256, 64, 256), (7, 32, 100)])
def test_matches_reference(n, d, bins, rng):
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((bins, d)).astype(np.float32))
    got = vq_mod.vq_nearest_pallas(x, cb, tile_n=64, tile_b=128)
    want = vq_nearest_reference(x, cb)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_exact_match_wins(rng):
    cb = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    x = cb[jnp.asarray([3, 17, 63, 0])]
    got = vq_mod.vq_nearest_pallas(x, cb, tile_n=8, tile_b=16)
    np.testing.assert_array_equal(np.asarray(got), [3, 17, 63, 0])

"""Unit tests for the fused decode-attention module (CPU: reference path).

The fused Pallas kernel itself only runs on TPU; these tests pin the packed
time-major layout contract and the dispatcher gating so the CPU fallback is
provably the same computation the kernel implements (the kernel-vs-reference
equivalence is asserted on chip by scripts/tpu_smoke.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ttts_tpu.ops.pallas.decode_attention import (
    decode_attention,
    decode_attention_reference,
    _eligible,
)


def _naive(q, uk, uv, kc, vc, pos):
    """Straight per-(head,batch)-column softmax attention in numpy."""
    kc = np.asarray(kc, np.float32).copy()
    vc = np.asarray(vc, np.float32).copy()
    kc[pos] = np.asarray(uk, np.float32)[0]
    vc[pos] = np.asarray(uv, np.float32)[0]
    q = np.asarray(q, np.float32)
    ml, dk, bh = kc.shape
    s = np.einsum("mdx,dx->mx", kc, q) / np.sqrt(dk)
    s[pos + 1:] = -np.inf
    s -= s.max(axis=0, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=0, keepdims=True)
    return np.einsum("mx,mdx->dx", p, vc), kc, vc


@pytest.mark.parametrize("pos", [0, 3, 63])
def test_reference_matches_naive(pos):
    rng = np.random.default_rng(0)
    ml, dk, bh = 64, 16, 8
    q = jnp.asarray(rng.standard_normal((dk, bh)), jnp.float32)
    uk = jnp.asarray(rng.standard_normal((1, dk, bh)), jnp.float32)
    uv = jnp.asarray(rng.standard_normal((1, dk, bh)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((ml, dk, bh)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((ml, dk, bh)), jnp.float32)
    o, k2, v2 = decode_attention_reference(q, uk, uv, kc, vc, pos)
    on, kn, vn = _naive(q, uk, uv, kc, vc, pos)
    np.testing.assert_allclose(np.asarray(o), on, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k2), kn, atol=0)
    np.testing.assert_allclose(np.asarray(v2), vn, atol=0)


def test_dispatcher_uses_reference_on_cpu():
    # CPU backend must always route to the XLA formulation (jittable, GSPMD
    # shardable) regardless of shape eligibility.
    rng = np.random.default_rng(1)
    ml, dk, bh = 256, 64, 128  # would be kernel-eligible on TPU
    args = [jnp.asarray(rng.standard_normal(s), jnp.float32)
            for s in ((dk, bh), (1, dk, bh), (1, dk, bh),
                      (ml, dk, bh), (ml, dk, bh))]
    o1, k1, v1 = decode_attention(*args, 7)
    o2, k2, v2 = decode_attention_reference(*args, 7)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_eligibility_gates():
    assert jax.default_backend() == "cpu"
    # CPU is never eligible
    assert not _eligible(256, 64, 128, 2, 128)
    # on-TPU rules, checked directly on the pure-shape part: lane width,
    # block divisibility, sublane multiple, VMEM budget
    import ttts_tpu.ops.pallas.decode_attention as m
    orig = m.jax.default_backend
    m.jax.default_backend = lambda: "tpu"
    try:
        assert m._eligible(256, 64, 128, 2, 128)
        assert not m._eligible(256, 64, 120, 2, 128)   # bh not lane multiple
        assert not m._eligible(250, 64, 128, 2, 128)   # ml not blk multiple
        assert not m._eligible(256, 50, 128, 2, 128)   # dk not 16 multiple
        assert not m._eligible(1 << 20, 64, 8192, 4, 128)  # VMEM blowout
    finally:
        m.jax.default_backend = orig


@pytest.mark.parametrize("pos,dtype", [
    (0, jnp.float32),        # first row: every panel but 0 must be skipped
    (63, jnp.float32),       # last row of panel 0 (blk=64 below)
    (64, jnp.float32),       # first row of panel 1: panel-skip boundary
    (70, jnp.bfloat16),      # serving cache dtype
    (255, jnp.float32),      # full cache: no panel skipped
])
def test_kernel_interpret_matches_reference(monkeypatch, pos, dtype):
    """Run the ACTUAL kernel body (online softmax, panel-skip predicates,
    row-update-before-read ordering) in Pallas interpret mode on CPU and pin
    it against the XLA formulation. The on-chip Mosaic compile + timing is
    covered by scripts/tpu_smoke.py; this catches logic regressions in CI."""
    from jax.experimental import pallas as pl
    import ttts_tpu.ops.pallas.decode_attention as m

    orig = pl.pallas_call
    monkeypatch.setattr(
        m.pl, "pallas_call",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    # fused_decode_attention is module-level jax.jit: pallas_call only runs
    # at TRACE time, so a pre-existing cached executable for this (shape,
    # dtype, blk) signature would bypass the patch — and an interpret-mode
    # executable must not leak past the patch's lifetime either.
    m.fused_decode_attention.clear_cache()
    try:
        rng = np.random.default_rng(3)
        ml, dk, bh = 256, 16, 128
        q, uk, uv, kc, vc = (
            jnp.asarray(rng.standard_normal(s), dtype)
            for s in ((dk, bh), (1, dk, bh), (1, dk, bh),
                      (ml, dk, bh), (ml, dk, bh)))
        o, k2, v2 = m.fused_decode_attention(q, uk, uv, kc, vc, pos, blk=64)
        orf, kr, vr = m.decode_attention_reference(q, uk, uv, kc, vc, pos)
        tol = 1e-6 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(np.asarray(o, np.float32),
                                   np.asarray(orf, np.float32), atol=tol)
        np.testing.assert_array_equal(np.asarray(k2), np.asarray(kr))
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(vr))
    finally:
        m.fused_decode_attention.clear_cache()


def test_reference_jits_under_scan():
    # the serving loop carries the caches through lax.scan — make sure the
    # packed-layout formulation stays shape-stable in a scan carry.
    rng = np.random.default_rng(2)
    ml, dk, bh = 32, 8, 4
    kc = jnp.asarray(rng.standard_normal((ml, dk, bh)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((ml, dk, bh)), jnp.float32)
    q0 = jnp.asarray(rng.standard_normal((dk, bh)), jnp.float32)

    def step(carry, i):
        kc, vc, q = carry
        o, kc, vc = decode_attention(q, q[None], q[None], kc, vc, i)
        return (kc, vc, o.astype(q.dtype)), o

    (_, _, _), outs = jax.jit(
        lambda c: jax.lax.scan(step, c, jnp.arange(4, 8))
    )((kc, vc, q0))
    assert np.isfinite(np.asarray(outs)).all()


# ---------------------------------------------------------------- spmd rule


def test_spmd_partitioning_exact_and_no_allgather():
    """decode_attention_spmd under a 4-way TP mesh: outputs shard along the
    packed bh dim, match the unsharded reference bit-for-bit, and the compiled
    program contains NO all-gather — the rule runs the dispatcher per-shard
    (the fused kernel on TPU; the XLA body here on CPU)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ttts_tpu.ops.pallas.decode_attention import decode_attention_spmd

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), ("model",))

    rng = np.random.default_rng(0)
    ml, dk, bh = 256, 32, 16
    q = jnp.asarray(rng.standard_normal((dk, bh)), jnp.float32)
    uk = jnp.asarray(rng.standard_normal((1, dk, bh)), jnp.float32)
    uv = jnp.asarray(rng.standard_normal((1, dk, bh)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((ml, dk, bh)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((ml, dk, bh)), jnp.float32)
    pos = jnp.int32(37)

    ref = jax.jit(decode_attention_reference)(q, uk, uv, kc, vc, pos)

    sh2 = NamedSharding(mesh, P(None, "model"))
    sh3 = NamedSharding(mesh, P(None, None, "model"))
    ops = (jax.device_put(q, sh2), jax.device_put(uk, sh3),
           jax.device_put(uv, sh3), jax.device_put(kc, sh3),
           jax.device_put(vc, sh3))

    f = jax.jit(decode_attention_spmd)
    out, k2, v2 = f(*ops, pos)
    # results stay sharded along bh — no implicit replication
    assert out.sharding.spec == P(None, "model"), out.sharding
    assert k2.sharding.spec == P(None, None, "model"), k2.sharding
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(ref[2]))

    hlo = f.lower(*ops, pos).compile().as_text()
    assert "all-gather" not in hlo, "spmd rule inserted an all-gather"


def test_spmd_matches_reference_single_device():
    """Outside any mesh, decode_attention_spmd is the plain dispatcher."""
    from ttts_tpu.ops.pallas.decode_attention import decode_attention_spmd

    rng = np.random.default_rng(3)
    ml, dk, bh = 64, 16, 8
    q = jnp.asarray(rng.standard_normal((dk, bh)), jnp.float32)
    uk = jnp.asarray(rng.standard_normal((1, dk, bh)), jnp.float32)
    uv = jnp.asarray(rng.standard_normal((1, dk, bh)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((ml, dk, bh)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((ml, dk, bh)), jnp.float32)
    for pos in (0, 5, 63):
        got = jax.jit(decode_attention_spmd)(q, uk, uv, kc, vc, pos)
        ref = decode_attention_reference(q, uk, uv, kc, vc, pos)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

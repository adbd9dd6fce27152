"""Fused ScaleShiftResBlock kernel (ops/pallas/resblock.py) — interpret-mode
body parity vs the flax module, plus the routing gates.

Chip-level timing/engagement is exercised by scripts/tpu_smoke.py and
scripts/profile_trunk_components.py; here the kernel body runs under the
Pallas interpreter on CPU (same pattern as the decode-attention body test).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.models.diffusion_net import ScaleShiftResBlock, _num_groups
from ttts_tpu.ops.pallas.resblock import (
    fused_scale_shift_resblock,
    resblock_reference,
)


def _operands(rng, B, T, C, dtype):
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, dtype)
    return dict(
        x=mk(B, T, C),
        g1=mk(C) + 1, b1=mk(C),
        w1=mk(C, C), bd1=mk(C),
        a2=mk(B, C) + 1, b2=mk(B, C),
        w3=mk(3, C, C), bc3=mk(C),
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(dtype):
    rng = np.random.default_rng(0)
    ops = _operands(rng, 2, 64, 256, dtype)
    ref = resblock_reference(**ops, groups=32)
    out = fused_scale_shift_resblock(**ops, groups=32, interpret=True)
    tol = 5e-6 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


def test_kernel_matches_flax_module():
    """End parity: kernel output == ScaleShiftResBlock.apply given the same
    params (combined GN₂×FiLM affine computed as the module wiring does)."""
    rng = np.random.default_rng(1)
    B, T, C = 2, 48, 256
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
    blk = ScaleShiftResBlock(C, C, C)
    params = blk.init(jax.random.key(0), x, emb)
    want = blk.apply(params, x, emb)

    p = params["params"]
    e = jax.nn.silu(emb) @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"]
    scale, shift = jnp.split(e, 2, axis=-1)
    gn2 = p["GroupNorm32_1"]["GroupNorm_0"]
    out = fused_scale_shift_resblock(
        x, p["GroupNorm32_0"]["GroupNorm_0"]["scale"],
        p["GroupNorm32_0"]["GroupNorm_0"]["bias"],
        p["Dense_0"]["kernel"], p["Dense_0"]["bias"],
        gn2["scale"] * (1 + scale), gn2["bias"] * (1 + scale) + shift,
        p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
        groups=_num_groups(C), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_module_fused_flag_is_inert_on_cpu():
    """fused=True must not change the param tree, and on CPU the gate falls
    back to the XLA path bit-for-bit."""
    rng = np.random.default_rng(2)
    B, T, C = 2, 16, 128
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
    base = ScaleShiftResBlock(C, C, C)
    fused = ScaleShiftResBlock(C, C, C, fused=True)
    params = base.init(jax.random.key(0), x, emb)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(fused.init(jax.random.key(0), x, emb)))
    np.testing.assert_array_equal(np.asarray(base.apply(params, x, emb)),
                                  np.asarray(fused.apply(params, x, emb)))


def test_gate_rules():
    """The fused route engages only where the kernel's constraints hold."""
    blk = ScaleShiftResBlock(512, 512, 512, fused=True)
    x_ok = jnp.zeros((1, 768, 512))
    bound = blk.bind({"params": {}})
    on_tpu = jax.default_backend() not in ("cpu",)
    assert bound._use_fused(x_ok, deterministic=True) == on_tpu
    assert not bound._use_fused(x_ok, deterministic=False)  # training path
    assert not bound._use_fused(jnp.zeros((1, 765, 512)), True)  # T % 8
    assert not bound._use_fused(jnp.zeros((1, 768, 320)), True)  # C % 128
    # VMEM ceiling: 5 f32 slabs past ~12 MiB must fall back
    assert not bound._use_fused(jnp.zeros((1, 2048, 512)), True)
    # channel-changing blocks keep XLA (skip projection not in the kernel)
    blk2 = ScaleShiftResBlock(512, 512, out_channels=256, fused=True)
    assert not blk2.bind({"params": {}})._use_fused(x_ok, True)


def test_gn_qkv_matches_flax_chain():
    """fused_gn_qkv == Dense(qkv)(GroupNorm32(x)) — the AttentionBlock
    producer chain (models/diffusion_net.py AttentionBlock.__call__)."""
    import flax.linen as nn

    from ttts_tpu.models.diffusion_net import GroupNorm32
    from ttts_tpu.ops.pallas.resblock import fused_gn_qkv

    rng = np.random.default_rng(3)
    B, T, C = 2, 64, 256
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    gn = GroupNorm32(C)
    pg = gn.init(jax.random.key(0), x)
    d = nn.Dense(3 * C)
    pd = d.init(jax.random.key(1), x)
    want = d.apply(pd, gn.apply(pg, x))
    out = fused_gn_qkv(
        x, pg["params"]["GroupNorm_0"]["scale"],
        pg["params"]["GroupNorm_0"]["bias"],
        pd["params"]["kernel"], pd["params"]["bias"],
        groups=_num_groups(C), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=5e-6)


def test_attention_block_fused_gn_inert_on_cpu():
    from ttts_tpu.models.diffusion_net import AttentionBlock

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 32, 128)), jnp.float32)
    ab = AttentionBlock(128, 8)
    abf = AttentionBlock(128, 8, fused_gn=True)
    pa = ab.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(pa)
            == jax.tree_util.tree_structure(abf.init(jax.random.key(0), x)))
    np.testing.assert_array_equal(np.asarray(ab.apply(pa, x)),
                                  np.asarray(abf.apply(pa, x)))

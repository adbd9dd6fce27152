"""Component-level attribution of the diffusion trunk step.

The 50-step DPM++2M tail is ~75% of serving wall at ~0.26 MFU; the round-4
flash kernel fixed the attention, leaving the step "GroupNorm/FiLM/
elementwise bandwidth-bound" (VERDICT r4). Before fusing anything, measure
WHERE the non-attention time actually goes (CLAUDE.md lesson f: measure
before writing kernels): one ScaleShiftResBlock, one AttentionBlock (flash
and einsum), and the sub-chains of the resblock (GN alone, GN+FiLM+SiLU,
Dense, Conv3) at the serving shape, all as amort-N slopes inside one jit
program (lesson d/l: single calls are tunnel-floor-bound; amort 64 for
kernel decisions).

    python scripts/profile_trunk_components.py [--batch 8] [--t 768] [--amort 64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _timeit(fn, iters):
    fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t", type=int, default=768)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--amort", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from ttts_tpu.config import DiffusionNetConfig
    from ttts_tpu.models.diffusion_net import (
        AA_diffusion, AttentionBlock, GroupNorm32, ScaleShiftResBlock,
    )

    cfg = DiffusionNetConfig()
    B, T, CH = args.batch, args.t, cfg.model_channels
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, CH)), dtype)
    emb = jnp.asarray(rng.standard_normal((B, CH)), dtype)

    def amortized(apply_fn, *inputs):
        if not inputs:  # default probe input: the (B, T, CH) activation
            inputs = (x,)
        n = args.amort

        def scan_n(k):
            def run(x0, *rest):
                def step(acc, _):
                    out = apply_fn(x0 + acc.astype(x0.dtype) * 1e-9, *rest)
                    return jnp.float32(acc + out.astype(jnp.float32).mean()), ()
                acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(k))
                return acc
            return jax.jit(run)
        f1, fN = scan_n(1), scan_n(n)
        t1 = _timeit(lambda: np.asarray(f1(*inputs)), args.iters)
        tN = _timeit(lambda: np.asarray(fN(*inputs)), args.iters)
        return (tN - t1) / (n - 1) * 1e3

    res = {"backend": jax.default_backend(), "batch": B, "t": T, "ch": CH,
           "amort": args.amort}

    # --- one full ScaleShiftResBlock (channels-last serving dtype) ---------
    blk = ScaleShiftResBlock(CH, CH, CH, dtype=dtype)
    pb = blk.init(jax.random.key(0), x, emb)
    res["resblock_ms"] = round(amortized(
        lambda xi: blk.apply(pb, xi, emb)), 4)

    # --- one AttentionBlock, flash and einsum routes ------------------------
    attn_f = AttentionBlock(CH, cfg.num_heads, dtype=dtype, flash=True)
    pa = attn_f.init(jax.random.key(1), x)
    strip = attn_f.apply(pa, T, B, method=attn_f.rel_bias)
    res["attn_flash_ms"] = round(amortized(
        lambda xi: attn_f.apply(pa, xi, rel_bias=strip)), 4)
    attn_e = AttentionBlock(CH, cfg.num_heads, dtype=dtype, flash=False)
    full_bias = attn_e.apply(pa, T, B, method=attn_e.rel_bias)
    res["attn_einsum_ms"] = round(amortized(
        lambda xi: attn_e.apply(pa, xi, rel_bias=full_bias)), 4)

    # --- resblock sub-chains -------------------------------------------------
    gn = GroupNorm32(CH)
    pg = gn.init(jax.random.key(2), x)
    res["gn_ms"] = round(amortized(lambda xi: gn.apply(pg, xi)), 4)
    res["gn_silu_ms"] = round(amortized(
        lambda xi: jax.nn.silu(gn.apply(pg, xi))), 4)

    scale = jnp.asarray(rng.standard_normal((B, 1, CH)), dtype)
    shift = jnp.asarray(rng.standard_normal((B, 1, CH)), dtype)
    res["gn_film_silu_ms"] = round(amortized(
        lambda xi: jax.nn.silu(gn.apply(pg, xi) * (1 + scale) + shift)), 4)

    dense = nn.Dense(CH, dtype=dtype)
    pd = dense.init(jax.random.key(3), x)
    res["dense512_ms"] = round(amortized(lambda xi: dense.apply(pd, xi)), 4)

    conv3 = nn.Conv(CH, (3,), padding="SAME", dtype=dtype)
    pc = conv3.init(jax.random.key(4), x)
    res["conv3_ms"] = round(amortized(lambda xi: conv3.apply(pc, xi)), 4)

    # silu alone (pure VPU/bandwidth floor: read+write one (B,T,C) array)
    res["silu_ms"] = round(amortized(lambda xi: jax.nn.silu(xi)), 4)

    # --- the whole trunk as serving runs it ---------------------------------
    net = AA_diffusion(cfg, dtype=dtype, flash=True)
    xm = jnp.asarray(rng.standard_normal((B, T, cfg.in_channels)), jnp.float32)
    lat = jnp.asarray(rng.standard_normal((B, 16, cfg.in_latent_channels)),
                      jnp.float32)
    tt = jnp.full((B,), 500, jnp.int32)
    pn = net.init(jax.random.key(5), xm, jnp.asarray([1.0]), lat,
                  jnp.asarray(rng.standard_normal((B, 32, cfg.in_channels)),
                              jnp.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, CH)), jnp.float32)
    biases = net.apply(pn, T, B, method=net.rel_biases)
    res["trunk_ms"] = round(amortized(
        lambda xi: net.apply(pn, xi.astype(jnp.float32), tt, cond,
                             rel_biases=biases, method=net.trunk),
        xm.astype(dtype)), 4)

    # bookkeeping: expected composition
    res["model_sum_ms"] = round(
        12 * res["resblock_ms"] + 9 * res["attn_flash_ms"], 4)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

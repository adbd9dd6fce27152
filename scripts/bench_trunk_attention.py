"""Micro-attribution of the diffusion-trunk attention at the serving shape.

VERDICT r3 #4: config 5c's ceiling is the 9 rel-pos attention blocks at
(B=8, H=16, T~768-896, dk=32). This script times, on the real chip, the
isolated attention op and ablated kernel variants to locate the bottleneck:

  xla_einsum      — the AttentionBlock einsum path with the full (H,T,T) bias
  flash           — ops/pallas/attention.py as-shipped (blk sweep)
  flash_nosoftmax — kernel with softmax replaced by a scale (MXU+bias only);
                    the gap to `flash` is the VPU softmax cost
  flash_nobias    — kernel without the Toeplitz bias (costs the rotate/add)
  flash_div_out   — normalize AFTER the PV dot: divide the (blk, D) output
                    instead of the (blk, T) probabilities (T/D fewer divides)

All timings are amortized scan slopes inside one jit program (tunnel
dispatch floor is ~30-40 ms; see CLAUDE.md). Usage:

    python scripts/bench_trunk_attention.py [--t 768] [--batch 8] [--iters 5]
"""

import argparse
import functools
import json
import math
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
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dk", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--amort", type=int, default=16)
    ap.add_argument("--variants", action="store_true",
                    help="also run the ablated kernel variants")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ttts_tpu.ops.pallas import attention as A

    B, T, H, D = args.batch, args.t, args.heads, args.dk
    n_amort = args.amort
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), bf)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), bf)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), bf)
    strip = jnp.asarray(rng.standard_normal((H, 2 * T - 1)), jnp.float32)
    scale = 1.0 / math.sqrt(D)

    def amortized(apply_fn):
        def scan_n(n):
            def run(q0):
                def step(acc, _):
                    # keep the perturbed q in ITS dtype (bf16) — promoting to
                    # f32 here doubles the kernel's VMEM and changes the op
                    qi = (q0.astype(jnp.float32) + acc * 1e-9).astype(q0.dtype)
                    out = apply_fn(qi, k, v)
                    return acc + out.astype(jnp.float32).mean(), ()
                acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
                return acc
            return jax.jit(run)
        f1, fN = scan_n(1), scan_n(n_amort)
        t1 = _timeit(lambda: np.asarray(f1(q)), args.iters)
        tN = _timeit(lambda: np.asarray(fN(q)), args.iters)
        return (tN - t1) / (n_amort - 1) * 1e3

    res = {"backend": jax.default_backend(), "batch": B, "t": T,
           "heads": H, "dk": D}

    # ---- XLA einsum path with the full bias (AttentionBlock else-branch)
    idx = np.arange(T)[None, :] - np.arange(T)[:, None] + T - 1
    bias_full = jnp.asarray(np.asarray(strip)[:, idx])  # (H, T, T)

    def xla_attn(qq, kk, vv):
        w = jnp.einsum("bthd,bshd->bhts", qq, kk) * scale
        w = w + bias_full[None].astype(w.dtype)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(qq.dtype)
        return jnp.einsum("bhts,bshd->bthd", w, vv)

    res["xla_einsum_ms"] = round(amortized(xla_attn), 3)

    # ---- shipped kernel, block-size sweep
    # blk must be a multiple of 128 (lane-aligned strip windows; 448 fails
    # Mosaic's "index multiple of 128" check) and divide T
    for blk in (128, 256, 384):
        if T % blk:
            continue
        res[f"flash_blk{blk}_ms"] = round(amortized(
            lambda qq, kk, vv, blk=blk: A.flash_attention(
                qq, kk, vv, strip=strip, scale=scale, blk=blk)), 3)

    # ---- ablated kernel variants (local copies; the library kernel stays)
    def make_variant(mode, blk=128):
        def kern(q_ref, k_ref, v_ref, strip_ref, o_ref):
            i0 = pl.program_id(1) * blk
            if mode != "nobias":
                start = pl.multiple_of(T - blk - i0, blk)
                windows = strip_ref[:, pl.ds(start, T + blk)]
            for h in range(H):
                qh = q_ref[0, h]
                kh = k_ref[0, h]
                s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * scale
                if mode != "nobias":
                    s = s + A._toeplitz_tile(windows[h], blk, T)
                if mode == "nosoftmax":
                    p = s * (1.0 / T)
                    o_ref[0, h] = jnp.dot(
                        p.astype(v_ref.dtype), v_ref[0, h],
                        preferred_element_type=jnp.float32).astype(o_ref.dtype)
                elif mode == "div_out":
                    m = jnp.max(s, axis=1, keepdims=True)
                    p = jnp.exp(s - m)
                    denom = jnp.sum(p, axis=1, keepdims=True)
                    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, h],
                                preferred_element_type=jnp.float32)
                    o_ref[0, h] = (o / denom).astype(o_ref.dtype)
                else:  # base / nobias
                    m = jnp.max(s, axis=1, keepdims=True)
                    p = jnp.exp(s - m)
                    p = p / jnp.sum(p, axis=1, keepdims=True)
                    o_ref[0, h] = jnp.dot(
                        p.astype(v_ref.dtype), v_ref[0, h],
                        preferred_element_type=jnp.float32).astype(o_ref.dtype)

        @functools.partial(jax.jit)
        def call(qq, kk, vv):
            qt = jnp.transpose(qq, (0, 2, 1, 3))
            kt = jnp.transpose(kk, (0, 2, 1, 3))
            vt = jnp.transpose(vv, (0, 2, 1, 3))
            pad = 2 * T + blk - strip.shape[1]
            strip_p = jnp.pad(strip, ((0, 0), (0, pad)))
            out = pl.pallas_call(
                kern,
                grid=(B, T // blk),
                in_specs=[
                    pl.BlockSpec((1, H, blk, D), lambda bb, ii: (bb, 0, ii, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, H, T, D), lambda bb, ii: (bb, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, H, T, D), lambda bb, ii: (bb, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(strip_p.shape, lambda bb, ii: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, H, blk, D),
                                       lambda bb, ii: (bb, 0, ii, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, H, T, D), qq.dtype),
            )(qt, kt, vt, strip_p)
            return jnp.transpose(out, (0, 2, 1, 3))

        return call

    if args.variants:
        for mode in ("base", "nosoftmax", "nobias", "div_out"):
            res[f"variant_{mode}_ms"] = round(amortized(make_variant(mode)), 3)

        # div_out must stay numerically identical to base
        base = make_variant("base")(q, k, v)
        dout = make_variant("div_out")(q, k, v)
        res["div_out_max_err"] = float(jnp.max(jnp.abs(
            base.astype(jnp.float32) - dout.astype(jnp.float32))))

    # speed-of-light references
    flops = 4 * B * H * T * T * D  # QK^T + PV, MACs x2
    res["mxu_peak_ms"] = round(flops / 197e12 * 1e3, 4)
    res["exp_elems_e9"] = round(B * H * T * T / 1e9, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

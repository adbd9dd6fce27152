"""Diffusion-trunk step attribution at the batched-serving shapes.

The 5c tail runs DPM++2M(50) over the AA_diffusion trunk at B=8 (4 streams
x CFG 2B), T=768. Weight-matmul FLOPs say an MXU-bound step is ~2 ms; the
measured tail implies ~12 ms/step. This script times, all amortized inside
one jit scan (N applies, slope vs 1 apply — removes the tunnel round-trip):

  trunk_ms                — the trunk apply with the precomputed strip
                            biases, exactly as the serving tail runs it
  trunk_default_route_ms  — the trunk choosing its own rel-bias path
                            (what _use_flash picks at this (B, T))

    python scripts/bench_diffusion_trunk.py [--batch 8] [--t 768] [--iters 5]
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
    ap.add_argument("--amort", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ttts_tpu.api import TextToSpeech
    from ttts_tpu.config import default_config

    tts = TextToSpeech(default_config(), seed=0, init_stages=("diffusion",))
    net = tts.diffusion_net
    p = tts._serve_params("diffusion")
    cfg = tts.cfg.diffusion_net
    B, T = args.batch, args.t
    n_amort = args.amort

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, cfg.in_channels)).astype(np.float32))
    tt = jnp.full((B,), 500, jnp.int32)
    emb = jnp.asarray(
        rng.standard_normal((B, T, cfg.model_channels)).astype(np.float32))

    def amortized(make_apply):
        """(scanN - scan1)/(N-1) inside single jit programs."""
        def scan_n(n):
            def run(x0):
                def step(acc, _):
                    out = make_apply(x0 + acc * 1e-9)
                    return jnp.float32(acc + out.astype(jnp.float32).mean()), ()
                acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
                return acc
            return jax.jit(run)
        f1, fN = scan_n(1), scan_n(n_amort)
        t1 = _timeit(lambda: np.asarray(f1(x)), args.iters)
        tN = _timeit(lambda: np.asarray(fN(x)), args.iters)
        return (tN - t1) / (n_amort - 1) * 1e3

    biases_strip = net.apply(p, T, B, method=net.rel_biases)

    res = {"backend": jax.default_backend(), "batch": B, "t": T}

    res["trunk_ms"] = round(amortized(
        lambda xi: net.apply(p, xi, tt, emb, rel_biases=biases_strip,
                             method=net.trunk)), 3)
    res["trunk_default_route_ms"] = round(amortized(
        lambda xi: net.apply(p, xi, tt, emb, method=net.trunk)), 3)

    # per-component: one DiffusionLayer attention and one ResBlock, x6
    flops_step = 2 * sum(int(np.prod(l.shape)) for l in
                         jax.tree_util.tree_leaves(p)) * B * T
    res["weight_flops_per_apply"] = float(f"{flops_step:.3e}")
    res["mxu_bound_ms_at_peak"] = round(flops_step / 197e12 * 1e3, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""Vocos tail analysis (VERDICT r2 weak #3 / next #8): which part bounds
config 4b's 0.19% MFU — the ConvNeXt backbone, the ISTFT-head Dense, or the
overlap-add scatter? Times each piece as its own jit program on the default
backend (the real chip under axon).

    python scripts/bench_vocos.py [--frames 768] [--batch 1] [--iters 10]
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
    ap.add_argument("--frames", type=int, default=768)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ttts_tpu.config import VocosConfig
    from ttts_tpu.models.vocos import ISTFTHead, Vocos, VocosBackbone
    from ttts_tpu.ops.stft import istft

    cfg = VocosConfig()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (args.batch, args.frames, cfg.input_channels)).astype(np.float32))

    vocos = Vocos(cfg)
    params = jax.jit(vocos.init)(jax.random.key(0), mel)

    backbone = VocosBackbone(cfg)
    bb_params = {"params": params["params"]["VocosBackbone_0"]}
    head = ISTFTHead(cfg.n_fft, cfg.hop_length, cfg.padding)
    hd_params = {"params": params["params"]["ISTFTHead_0"]}

    full = jax.jit(lambda p, m: vocos.apply(p, m))
    bb = jax.jit(lambda p, m: backbone.apply(p, m))
    hd = jax.jit(lambda p, x: head.apply(p, x))
    x_bb = bb(bb_params, mel)

    # complex64 host->device transfers are Unimplemented over the axon
    # tunnel — ship re/im floats and form the complex spec inside the jit
    spec_re = jnp.asarray(rng.standard_normal(
        (args.batch, cfg.n_fft // 2 + 1, args.frames)).astype(np.float32))
    spec_im = jnp.asarray(rng.standard_normal(
        (args.batch, cfg.n_fft // 2 + 1, args.frames)).astype(np.float32))
    oa = jax.jit(lambda re, im: istft(jax.lax.complex(re, im), cfg.n_fft,
                                      cfg.hop_length, cfg.n_fft,
                                      padding=cfg.padding))

    # amortized cost: N sequential applies inside ONE jit program — the
    # tunnel round-trip (~30 ms/dispatch) otherwise dominates micro-rows;
    # the (scanN - scan1)/(N-1) slope is the true device cost per apply.
    n_amort = 8

    def scan_n(p, m, n):
        def step(acc, i):
            out = vocos.apply(p, m + acc * 1e-9)
            return jnp.float32(acc + out.sum()), ()
        acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
        return acc

    scan1 = jax.jit(lambda p, m: scan_n(p, m, 1))
    scanN = jax.jit(lambda p, m: scan_n(p, m, n_amort))
    t1 = _timeit(lambda: np.asarray(scan1(params, mel)), args.iters)
    tN = _timeit(lambda: np.asarray(scanN(params, mel)), args.iters)
    amortized_ms = (tN - t1) / (n_amort - 1) * 1e3

    res = {
        "full_ms": round(_timeit(lambda: np.asarray(full(params, mel)), args.iters) * 1e3, 3),
        "amortized_ms_per_apply": round(amortized_ms, 3),
        "amortized_mel_frames_per_sec": round(
            args.batch * args.frames / (amortized_ms / 1e3), 1),
        "backbone_ms": round(_timeit(lambda: np.asarray(bb(bb_params, mel)), args.iters) * 1e3, 3),
        "head_ms": round(_timeit(lambda: np.asarray(hd(hd_params, x_bb)), args.iters) * 1e3, 3),
        "istft_only_ms": round(_timeit(lambda: np.asarray(oa(spec_re, spec_im)), args.iters) * 1e3, 3),
        "frames": args.frames,
        "batch": args.batch,
        "backend": jax.default_backend(),
    }
    res["mel_frames_per_sec_full"] = round(
        args.batch * args.frames / (res["full_ms"] / 1e3), 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

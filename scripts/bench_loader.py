"""Host data-path throughput for codec GAN training (VERDICT r2 weak #5).

Measures the REAL loader path (mains.make_vqvae_loader: native wav decode →
resample → bucket batches → NANSY phase-vocoder warp in collate threads)
against the measured device step time, and reports headroom:

    python scripts/bench_loader.py [--clips 64] [--secs 8] [--batch 16] \
        [--step-ms 433] [--no-warp]

A loader that cannot sustain >= the step's audio consumption rate would
silently serialize training behind the host (the reference hid this in
num_workers=32 torch DataLoaders, vqvae/train.py:137-175).
"""

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=64)
    ap.add_argument("--secs", type=float, default=8.0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--step-ms", type=float, default=433.0,
                    help="measured GAN step wall time (BENCH_DETAIL)")
    ap.add_argument("--no-warp", action="store_true")
    ap.add_argument("--batches", type=int, default=12)
    args = ap.parse_args()

    import dataclasses
    import pathlib

    from ttts_tpu.config import default_config
    from ttts_tpu.data.audio import save_wav
    from ttts_tpu.data.datasets import VQGANDataset
    from ttts_tpu.data.manifest import write_manifest
    from ttts_tpu.train.mains import make_vqvae_loader

    cfg = default_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, batch_size=args.batch, aug_warp=not args.no_warp))
    sr = cfg.audio.sampling_rate
    rng = np.random.default_rng(0)

    with tempfile.TemporaryDirectory() as d:
        rows = []
        for i in range(args.clips):
            p = pathlib.Path(d) / f"{i}.wav"
            save_wav(p, (0.1 * rng.standard_normal(int(args.secs * sr))
                         ).astype(np.float32), sr)
            rows.append({"text": "ni3 hao3", "path": str(p)})
        manifest = pathlib.Path(d) / "m.jsonl"
        write_manifest(manifest, rows)

        ds = VQGANDataset(str(manifest), sample_rate=sr,
                          hop_length=cfg.audio.hop_length)
        loader = make_vqvae_loader(cfg, ds)

        it = iter(loader)
        next(it)  # warm caches (native lib load, thread pool spin-up)
        audio_s = 0.0
        t0 = time.perf_counter()
        n = 0
        while n < args.batches:
            try:
                b = next(it)
            except StopIteration:
                it = iter(loader)
                continue
            if b is None:
                continue
            audio_s += b["wav"].shape[0] * b["wav"].shape[1] / sr
            n += 1
        dt = time.perf_counter() - t0

    loader_rate = audio_s / dt
    step_rate = (args.batch * args.secs) / (args.step_ms / 1000.0)
    out = {
        "metric": "vqvae_loader_audio_sec_per_sec",
        "value": round(loader_rate, 1),
        "unit": f"audio-s/s (batch {args.batch}, {args.secs}s clips, "
                f"warp={'off' if args.no_warp else 'on'})",
        "step_consumption_audio_sec_per_sec": round(step_rate, 1),
        "headroom_x": round(loader_rate / step_rate, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

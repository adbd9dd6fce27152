"""Misc dataset hygiene tools (reference ttts/prepare/ leftovers + ttts/script/).

  classify     — run the audio-quality classifier over a manifest and emit
                 noise_files.txt (ttts/classifier/infer.py classify_audio_clip
                 + the filter pipeline input)
  unique-spk   — deduplicate speakers by a per-file embedding hash
                 (prepare/unique_spk.py approximation: the reference clustered
                 speaker embeddings; we bucket by classifier embedding)
  remove-empty — drop manifest rows whose audio path is missing/empty
                 (prepare/remove_empty_paths.py)
  do-to-files  — apply `module:function` to every file in a list in a process
                 pool (script/do_to_files.py)
"""

from __future__ import annotations

import argparse
import pathlib
from concurrent.futures import ProcessPoolExecutor
from typing import Optional

import numpy as np

from ttts_tpu.data.manifest import read_manifest, write_manifest
from ttts_tpu.utils.logging import get_logger

log = get_logger("prepare.misc")


def classify_audio_clip(model, variables, mel_np: np.ndarray) -> int:
    """argmax class for one (T, spec_dim) mel (classifier/infer.py:16)."""
    import jax.numpy as jnp

    logits = model.apply(variables, jnp.asarray(mel_np)[None])
    return int(np.argmax(np.asarray(logits)[0]))


def cmd_classify(args):
    import jax.numpy as jnp

    from ttts_tpu.config import default_config, load_config
    from ttts_tpu.data.audio import load_wav
    from ttts_tpu.infer_utils import load_model
    from ttts_tpu.ops.mel import acoustic_mel_spectrogram

    cfg = load_config(args.config) if args.config else default_config()
    model, variables = load_model("classifier", args.ckpt, cfg)
    flagged = []
    for row in read_manifest(args.manifest):
        wav, _ = load_wav(row["path"], target_sr=24000)
        mel = acoustic_mel_spectrogram(jnp.asarray(wav)[None]).swapaxes(1, 2)
        if classify_audio_clip(model, variables, np.asarray(mel)[0]) != 0:
            flagged.append(row["path"])
    pathlib.Path(args.out).write_text("\n".join(flagged) + "\n")
    log.info("classify: flagged %d/%d", len(flagged), len(read_manifest(args.manifest)))


def cmd_remove_empty(args):
    rows = []
    for r in read_manifest(args.manifest):
        p = pathlib.Path(r["path"])
        if p.exists() and p.stat().st_size > 44:
            rows.append(r)
    write_manifest(args.out, rows)
    log.info("remove-empty: kept %d rows", len(rows))


def cmd_do_to_files(args):
    import importlib

    mod_name, fn_name = args.fn.split(":")
    fn = getattr(importlib.import_module(mod_name), fn_name)
    paths = [l.strip() for l in open(args.file_list) if l.strip()]
    with ProcessPoolExecutor(max_workers=args.workers) as pool:
        list(pool.map(fn, paths))
    log.info("do-to-files: processed %d files", len(paths))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("classify")
    s.add_argument("--manifest", required=True)
    s.add_argument("--ckpt", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--config", default=None)
    s.set_defaults(fn=cmd_classify)

    s = sub.add_parser("remove-empty")
    s.add_argument("--manifest", required=True)
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_remove_empty)

    s = sub.add_parser("do-to-files")
    s.add_argument("--file-list", required=True)
    s.add_argument("--fn", required=True, help="module:function")
    s.add_argument("--workers", type=int, default=8)
    s.set_defaults(fn=cmd_do_to_files)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

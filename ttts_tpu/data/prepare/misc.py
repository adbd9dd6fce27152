"""Misc dataset hygiene tools (reference ttts/prepare/ leftovers + ttts/script/).

  classify     — run the audio-quality classifier over a manifest and emit
                 noise_files.txt (ttts/classifier/infer.py classify_audio_clip
                 + the filter pipeline input)
  unique-spk   — per speaker folder, flag clips a speaker-verification hook
                 says mismatch a random reference clip
                 (prepare/unique_spk.py + unique_spk_process.py; the SV
                 model — reference: ModelScope CAM++ — is injected)
  prune-single-wav — list/delete folders holding exactly one wav
                 (prepare/delete_one_file_dir.py)
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


def unique_spk_scan(root: str, same_speaker, rng=None) -> list:
    """Per speaker folder: pick a random reference clip and flag every clip
    the verifier says is a DIFFERENT speaker (prepare/unique_spk_process.py:
    14-41 — reference clip drawn from audio_files[1:], mismatches recorded
    to a deletion jsonl; the ModelScope CAM++ pipeline is the injected
    `same_speaker(ref_path, path) -> bool`, same process boundary as ASR).
    Single-clip folders are flagged whole (the reference deletes them —
    prepare/delete_one_file_dir.py does the same sweep)."""
    import random

    rng = rng or random.Random(0)
    flagged = []
    for folder in sorted(p for p in pathlib.Path(root).iterdir() if p.is_dir()):
        wavs = sorted(str(x) for x in folder.glob("*.wav"))
        if not wavs:
            continue
        if len(wavs) == 1:
            flagged.append({"path": wavs[0], "reason": "single-clip-folder"})
            continue
        ref = rng.choice(wavs[1:])
        for w in wavs:
            if not same_speaker(ref, w):
                flagged.append({"path": w, "reason": "speaker-mismatch"})
    return flagged


def cmd_unique_spk(args):
    import importlib
    import json

    if not args.sv_hook:
        raise SystemExit(
            "no speaker-verification backend in this environment; pass "
            "--sv-hook my_module exposing same_speaker(ref_path, path)->bool "
            "(reference used ModelScope CAM++, unique_spk_process.py:8-12)"
        )
    same = importlib.import_module(args.sv_hook).same_speaker
    flagged = unique_spk_scan(args.root, same)
    with open(args.out, "w", encoding="utf-8") as f:
        for row in flagged:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    log.info("unique-spk: flagged %d clips → %s", len(flagged), args.out)


def single_wav_folders(root: str) -> list:
    """Top-down walk flagging folders whose IMMEDIATE contents hold exactly
    one .wav (prepare/delete_one_file_dir.py:6-19). A flagged folder is NOT
    descended into — the reference rmtree's it whole and moves on — so the
    returned list never contains a folder nested inside another flagged one
    (deleting in order is safe)."""
    out = []

    def walk(folder: pathlib.Path):
        wavs = [p for p in folder.iterdir()
                if p.is_file() and p.suffix == ".wav"]
        if len(wavs) == 1:
            out.append(str(folder))
            return  # do not descend into a folder slated for deletion
        for sub in sorted(p for p in folder.iterdir() if p.is_dir()):
            walk(sub)

    for top in sorted(p for p in pathlib.Path(root).iterdir() if p.is_dir()):
        walk(top)
    return out


def cmd_prune_single_wav(args):
    import shutil

    folders = single_wav_folders(args.root)
    pathlib.Path(args.out).write_text("\n".join(folders) + ("\n" if folders else ""))
    if args.delete:
        for f in folders:
            shutil.rmtree(f)
    log.info("prune-single-wav: %d folders %s → %s", len(folders),
             "deleted" if args.delete else "listed (dry-run)", args.out)


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

    s = sub.add_parser("unique-spk")
    s.add_argument("--root", required=True, help="speaker-folder root")
    s.add_argument("--out", required=True, help="deletion jsonl")
    s.add_argument("--sv-hook", default=None,
                   help="module exposing same_speaker(ref, path)->bool")
    s.set_defaults(fn=cmd_unique_spk)

    s = sub.add_parser("prune-single-wav")
    s.add_argument("--root", required=True)
    s.add_argument("--out", required=True, help="list of flagged folders")
    s.add_argument("--delete", action="store_true",
                   help="actually delete (default: dry-run list)")
    s.set_defaults(fn=cmd_prune_single_wav)

    s = sub.add_parser("do-to-files")
    s.add_argument("--file-list", required=True)
    s.add_argument("--fn", required=True, help="module:function")
    s.add_argument("--workers", type=int, default=8)
    s.set_defaults(fn=cmd_do_to_files)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

"""Classifier training pipeline, producer→consumer through the real CLIs.

Covers the reference's dataset-filtering story end-to-end
(ttts/classifier/dataset.py:13 PreprocessedMelDataset, classifier/train.py:36
Trainer, classifier/infer.py:16 classify_audio_clip,
prepare/filter_noise_and_other_spk.py:23):

  pipeline mel  →  mains classifier (train)  →  misc classify
  → noise_files.txt  →  pipeline filter-noise  →  filtered manifest

Clean clips are quiet tones, noise clips loud white noise — trivially
separable in log-mel space so a tiny model converges in ~60 steps on CPU.
"""

import dataclasses
import json
import pathlib

import numpy as np
import pytest

from ttts_tpu.config import ClassifierConfig, TTTSConfig, TrainConfig, to_dict
from ttts_tpu.data.audio import save_wav
from ttts_tpu.data.datasets import PreprocessedMelDataset
from ttts_tpu.data.manifest import read_manifest, write_manifest

SR = 24000


def _make_corpus(root: pathlib.Path, n_per_class: int = 6):
    """clean/ holds quiet 220 Hz tones, noise/ loud white noise."""
    rng = np.random.default_rng(7)
    clean_dir, noise_dir = root / "clean", root / "noise"
    clean_dir.mkdir()
    noise_dir.mkdir()
    t = np.arange(SR // 2) / SR
    rows = []
    for i in range(n_per_class):
        w = 0.05 * np.sin(2 * np.pi * (220 + 10 * i) * t).astype(np.float32)
        p = clean_dir / f"c{i}.wav"
        save_wav(p, w, SR)
        rows.append({"text": "ni3 hao3", "path": str(p)})
    for i in range(n_per_class):
        w = (0.5 * rng.standard_normal(SR // 2)).astype(np.float32)
        p = noise_dir / f"n{i}.wav"
        save_wav(p, w, SR)
        rows.append({"text": "ni3 hao3", "path": str(p)})
    return clean_dir, noise_dir, rows


def _tiny_cfg(tmp: pathlib.Path) -> pathlib.Path:
    cfg = TTTSConfig(
        classifier=ClassifierConfig(
            classes=2, spec_dim=100, embedding_dim=32, depth=2,
            downsample_factor=4, resnet_blocks=1, attn_blocks=1,
            num_attn_heads=2, base_channels=8, kernel_size=3,
            pad_to_mel_frames=32,
        ),
        train=TrainConfig(batch_size=4, train_steps=60, save_freq=60,
                          keep_ckpts=1, seed=0),
    )
    p = tmp / "cfg.json"
    p.write_text(json.dumps(to_dict(cfg)))
    return p


@pytest.mark.slow
def test_classifier_train_classify_filter(tmp_path):
    clean_dir, noise_dir, rows = _make_corpus(tmp_path)
    manifest = tmp_path / "all.jsonl"
    write_manifest(manifest, rows)

    # producer 1: mel sidecars through the real CLI
    from ttts_tpu.data.prepare import pipeline

    pipeline.main(["mel", "--manifest", str(manifest)])
    assert (clean_dir / "c0.wav.mel.npy").exists()

    # clean list exercises the DIRECTORY branch (rglob), noise list the
    # per-wav branch (reference dataset.py:23-29 handles both)
    clean_list = tmp_path / "clean.txt"
    clean_list.write_text(str(clean_dir) + "\n")
    noise_list = tmp_path / "noise.txt"
    noise_list.write_text(
        "\n".join(str(p) for p in sorted(noise_dir.glob("*.wav"))) + "\n")

    ds = PreprocessedMelDataset(str(clean_list), str(noise_list), pad_to=32)
    assert len(ds) == len(rows)
    ex = ds[0]
    assert ex["mel"].shape == (32, 100) and ex["label"] == 0
    assert ds[len(ds) - 1]["label"] == 1

    # producer 2: train through the real mains CLI
    from ttts_tpu.train import mains

    cfg_path = _tiny_cfg(tmp_path)
    logs = tmp_path / "logs"
    mains.main(["classifier", "--config", str(cfg_path),
                "--clean", str(clean_list), "--noise", str(noise_list),
                "--logs", str(logs)])
    assert (logs / "ckpt").exists()

    # consumer 1: misc classify with the trained checkpoint
    from ttts_tpu.data.prepare import misc

    noise_files = tmp_path / "noise_files.txt"
    misc.main(["classify", "--manifest", str(manifest),
               "--ckpt", str(logs / "ckpt"), "--out", str(noise_files),
               "--config", str(cfg_path)])
    flagged = {l for l in noise_files.read_text().splitlines() if l}
    noise_paths = {r["path"] for r in rows if "/noise/" in r["path"]}
    clean_paths = {r["path"] for r in rows} - noise_paths
    assert flagged == noise_paths, (flagged, noise_paths)

    # consumer 2: filter-noise drops exactly the flagged rows
    filtered = tmp_path / "filtered.jsonl"
    pipeline.main(["filter-noise", "--manifest", str(manifest),
                   "--noise-files", str(noise_files), "--out", str(filtered)])
    kept = {r["path"] for r in read_manifest(filtered)}
    assert kept == clean_paths


def test_preprocessed_mel_dataset_crop_and_collate(tmp_path):
    """Random crop when longer than pad_to; zero-pad when shorter
    (reference dataset.py:44-51)."""
    wav = tmp_path / "x.wav"
    long_mel = np.arange(50 * 100, dtype=np.float32).reshape(100, 50)  # (C,T)
    np.save(str(wav) + ".mel.npy", long_mel)
    short = tmp_path / "y.wav"
    np.save(str(short) + ".mel.npy", np.ones((100, 3), np.float32))
    clean = tmp_path / "c.txt"
    clean.write_text(str(wav) + "\n")
    noise = tmp_path / "n.txt"
    noise.write_text(str(short) + "\n")

    ds = PreprocessedMelDataset(str(clean), str(noise), pad_to=8,
                                rng=np.random.default_rng(0))
    a, b = ds[0], ds[1]
    assert a["mel"].shape == (8, 100) and b["mel"].shape == (8, 100)
    # cropped window is contiguous frames of the transposed (T,C) mel
    assert np.all(np.diff(a["mel"][:, 0]) == 1.0)
    # short mel zero-padded at the tail
    assert np.all(b["mel"][:3] == 1.0) and np.all(b["mel"][3:] == 0.0)
    batch = ds.collate([a, b, None])
    assert batch["mel"].shape == (2, 8, 100)
    assert batch["labels"].tolist() == [0, 1]

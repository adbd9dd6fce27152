"""HuBERT feature sidecar extraction (reference ttts/prepare/hubert_to_disk.py
+ ttts/utils/cnhubert.py): writes `<wav>.hubert.npy` 16 kHz content features —
the distillation target for RVQ1-era codec training (rvq1.py:305).

HuBERT is a third-party host-side model (the reference loads
chinese-hubert-base via transformers). Gated: requires transformers weights
available locally (no egress in this image → pass --model-dir).

usage: python -m ttts_tpu.data.prepare.hubert --manifest m.jsonl --model-dir hubert/
"""

from __future__ import annotations

import argparse

import numpy as np

from ttts_tpu.data.audio import load_wav
from ttts_tpu.data.manifest import read_manifest, save_sidecar
from ttts_tpu.utils.logging import get_logger

log = get_logger("prepare.hubert")


def get_hubert_model(model_dir: str):
    """Load a local HuBERT checkpoint (vc_utils.get_hubert_model:210 /
    cnhubert.py:20 semantics, transformers backend)."""
    import torch
    from transformers import HubertModel, Wav2Vec2FeatureExtractor

    extractor = Wav2Vec2FeatureExtractor.from_pretrained(model_dir)
    model = HubertModel.from_pretrained(model_dir)
    model.eval()
    return model, extractor


def extract_hubert(model, extractor, wav16k: np.ndarray) -> np.ndarray:
    import torch

    inputs = extractor(wav16k, sampling_rate=16000, return_tensors="pt")
    with torch.no_grad():
        out = model(inputs.input_values).last_hidden_state
    return out[0].numpy()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", required=True)
    p.add_argument("--model-dir", required=True,
                   help="local chinese-hubert-base directory")
    args = p.parse_args(argv)

    model, extractor = get_hubert_model(args.model_dir)
    rows = read_manifest(args.manifest)
    for row in rows:
        wav, _ = load_wav(row["path"], target_sr=16000)
        feats = extract_hubert(model, extractor, wav)
        save_sidecar(row["path"], "hubert", feats.astype(np.float32))
    log.info("hubert: wrote %d sidecars", len(rows))


if __name__ == "__main__":
    main()

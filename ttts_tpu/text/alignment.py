"""Forced alignment + redaction (reference ttts/utils/wav2vec_alignment.py).

The v1 api supports Tortoise's `[bracket]` redaction: text inside brackets is
spoken-then-removed by CTC-aligning the generated audio against the full text
(Wav2VecAlignment.redact, wav2vec_alignment.py) and cutting the aligned spans.

wav2vec2+CTC is a third-party host model; alignment is gated on a local
checkpoint directory (no egress in this image). The bracket parsing and span
cutting are dependency-free and tested.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import numpy as np


def parse_redactions(text: str) -> Tuple[str, List[str]]:
    """'hello [world] x' → ('hello world x', ['world']) (api.py redaction
    contract: bracketed text is spoken but removed from the output audio)."""
    redactions = re.findall(r"\[(.*?)\]", text)
    clean = re.sub(r"\[(.*?)\]", r"\1", text)
    return clean, redactions


class Wav2VecAlignment:
    """CTC forced aligner over a local wav2vec2 checkpoint."""

    def __init__(self, model_dir: str):
        import torch  # host-side third-party model
        from transformers import Wav2Vec2ForCTC, Wav2Vec2Processor

        self.processor = Wav2Vec2Processor.from_pretrained(model_dir)
        self.model = Wav2Vec2ForCTC.from_pretrained(model_dir).eval()

    def align(self, audio16k: np.ndarray, text: str) -> List[Tuple[int, int, str]]:
        """Greedy CTC char alignment → [(start_sample, end_sample, char)]."""
        import torch

        inputs = self.processor(audio16k, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            logits = self.model(inputs.input_values).logits[0]
        ids = logits.argmax(-1).numpy()
        frames_per_sample = len(audio16k) / len(ids)
        chars = self.processor.tokenizer.convert_ids_to_tokens(list(ids))
        spans = []
        for i, ch in enumerate(chars):
            if ch not in ("<pad>", "|"):
                s = int(i * frames_per_sample)
                e = int((i + 1) * frames_per_sample)
                spans.append((s, e, ch.lower()))
        return spans

    def redact(self, audio16k: np.ndarray, text: str) -> np.ndarray:
        """Cut bracketed spans out of the audio (wav2vec_alignment.py redact)."""
        clean, redactions = parse_redactions(text)
        if not redactions:
            return audio16k
        spans = self.align(audio16k, clean)
        aligned_text = "".join(ch for _, _, ch in spans)
        out = audio16k
        cut: List[Tuple[int, int]] = []
        for red in redactions:
            target = re.sub(r"[^a-z0-9]", "", red.lower())
            pos = aligned_text.find(target)
            if pos < 0 or not target:
                continue
            start = spans[pos][0]
            end = spans[min(pos + len(target) - 1, len(spans) - 1)][1]
            cut.append((start, end))
        if not cut:
            return audio16k
        keep = np.ones(len(audio16k), bool)
        for s, e in cut:
            keep[s:e] = False
        return out[keep]

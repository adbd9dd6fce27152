"""Batched-stream serving test (BASELINE config 5, batched)."""

import numpy as np
import pytest

from tests.test_api import TINY
from ttts_tpu.api import TextToSpeech


@pytest.mark.slow
def test_tts_batch_smoke():
    tts = TextToSpeech(TINY, seed=0)
    rng = np.random.default_rng(0)
    voice = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    wavs = tts.tts_batch(
        ["ni3 hao3", "shi4 jie4 hao3"], voice, 32000, preset="ultra_fast",
        max_generate_length=32, voice_cache_key="v0",
    )
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1 and w.shape[0] > 500
        assert np.isfinite(w).all()

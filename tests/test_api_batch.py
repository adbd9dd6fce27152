"""Batched-stream serving test (BASELINE config 5, batched)."""

import numpy as np
import pytest

from tests.test_api import TINY
from ttts_tpu.api import TextToSpeech

pytestmark = pytest.mark.heavy  # compile-heavy; fast loop = -m "not heavy"


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


@pytest.mark.slow
def test_tts_batch_mesh_matches_single_device():
    """Data-parallel serving (TextToSpeech(mesh=...)): 8 streams sharded over
    the 8-device 'data' axis must produce the same audio as the unsharded
    run — every stream is independent, so GSPMD partitioning is exact."""
    import jax

    from ttts_tpu.parallel import make_mesh
    from ttts_tpu.config import MeshConfig

    rng = np.random.default_rng(0)
    voice = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    texts = ["ni3 hao3", "shi4 jie4 hao3", "jin1 tian1", "tian1 qi4 hao3"] * 2

    tts = TextToSpeech(TINY, seed=0)
    ref = tts.tts_batch(texts, voice, 32000, preset="ultra_fast",
                        max_generate_length=32, voice_cache_key="v0")

    mesh = make_mesh(MeshConfig(data=8, model=1), devices=jax.devices()[:8])
    tts_m = TextToSpeech(TINY, seed=0, params=tts.params, mesh=mesh)
    out = tts_m.tts_batch(texts, voice, 32000, preset="ultra_fast",
                          max_generate_length=32, voice_cache_key="v0")

    assert len(out) == len(ref) == 8
    for a, b in zip(out, ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-4)


@pytest.mark.slow
def test_tts_batch_many_matches_serial():
    """Pipelined sustained serving (tts_batch_many) must be bit-identical to
    per-batch tts_batch calls with the same per-batch seeds — only the
    dispatch order differs, never the programs or the PRNG keys."""
    tts = TextToSpeech(TINY, seed=0)
    rng = np.random.default_rng(0)
    voice = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    batches = [["ni3 hao3", "shi4 jie4 hao3"],
               ["jin1 tian1", "tian1 qi4 hao3"]]

    piped = tts.tts_batch_many(batches, voice, 32000, preset="ultra_fast",
                               max_generate_length=32, seed=7,
                               voice_cache_key="v0")
    for i, texts in enumerate(batches):
        ref = tts.tts_batch(texts, voice, 32000, preset="ultra_fast",
                            max_generate_length=32, seed=7 + i,
                            voice_cache_key="v0")
        assert len(piped[i]) == len(ref)
        for a, b in zip(piped[i], ref):
            assert a.shape == b.shape
            np.testing.assert_array_equal(a, b)

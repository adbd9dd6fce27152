"""Data pipeline tests: native audio IO, manifests, datasets, bucketing."""

import json
import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from ttts_tpu.data.audio import load_wav, resample_audio, save_wav, vad_split, _native
from ttts_tpu.data.datasets import GptTtsDataset, VQGANDataset
from ttts_tpu.data.manifest import (
    load_sidecar,
    read_manifest,
    save_sidecar,
    write_manifest,
)
from ttts_tpu.data.sampler import DistributedBucketSampler
from ttts_tpu.ops.resample import resample as jax_resample


class TestAudioIO:
    def test_native_lib_loads(self):
        assert _native() is not None, "libttts_audio.so should be built (make -C ttts_tpu/native)"

    def test_wav_roundtrip(self, tmp_path, rng):
        x = (rng.standard_normal(24000) * 0.2).astype(np.float32)
        p = tmp_path / "a.wav"
        save_wav(p, x, 24000)
        y, sr = load_wav(p)
        assert sr == 24000
        assert y.shape == x.shape
        # PCM16 quantization step + 32767/32768 scale bias
        np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1.0 / 10000)

    def test_load_with_resample(self, tmp_path, rng):
        x = np.sin(2 * np.pi * 440 * np.arange(32000) / 32000).astype(np.float32)
        p = tmp_path / "b.wav"
        save_wav(p, x, 32000)
        y, sr = load_wav(p, target_sr=24000)
        assert sr == 24000
        assert abs(len(y) - 24000) <= 1

    def test_native_resample_matches_jax(self, rng):
        x = rng.standard_normal(5000).astype(np.float32)
        a = resample_audio(x, 32000, 24000)
        b = np.asarray(jax_resample(jnp.asarray(x[None]), 32000, 24000))[0]
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_vad_split_tone_silence_tone(self):
        sr = 16000
        tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
        sil = np.zeros(sr)
        x = np.concatenate([tone, sil, tone]).astype(np.float32)
        segs = vad_split(x, sr, min_silence_ms=500, silence_thresh_db=-40)
        assert len(segs) == 2
        (s0, e0), (s1, e1) = segs
        assert s0 < sr * 0.2 and abs(e0 - sr) < sr * 0.2
        assert abs(s1 - 2 * sr) < sr * 0.2


class TestManifest:
    def test_roundtrip(self, tmp_path):
        rows = [{"text": "ni3 hao3", "path": "/x/a.wav"}, {"text": "shi4 jie4", "path": "/x/b.wav"}]
        p = tmp_path / "m.jsonl"
        write_manifest(p, rows)
        assert read_manifest(p) == rows

    def test_sidecar_npy(self, tmp_path):
        wav = str(tmp_path / "a.wav")
        codes = np.arange(10, dtype=np.int32)
        save_sidecar(wav, "vq", codes)
        np.testing.assert_array_equal(load_sidecar(wav, "vq"), codes)


class TestGptDataset:
    @pytest.fixture
    def manifest(self, tmp_path, rng):
        rows = []
        for i in range(4):
            wav = str(tmp_path / f"{i}.wav")
            save_sidecar(wav, "vq", rng.integers(0, 1024, size=(20 + i,)).astype(np.int32))
            rows.append({"text": "ni3 hao3 shi4 jie4", "path": wav})
        p = tmp_path / "m.jsonl"
        write_manifest(p, rows)
        return p

    def test_examples_and_collate(self, manifest):
        ds = GptTtsDataset(str(manifest))
        ex = [ds[i] for i in range(len(ds))]
        assert all(e is not None for e in ex)
        batch = ds.collate(ex, pad_to=16)
        assert batch["text"].shape[1] % 16 == 0
        assert batch["mel_codes"].shape == (4, 32)  # max 23 → round to 32
        assert (batch["wav_lengths"] == np.asarray([20, 21, 22, 23]) * 1024).all()

    def test_missing_sidecar_returns_none(self, tmp_path):
        p = tmp_path / "m.jsonl"
        write_manifest(p, [{"text": "a", "path": str(tmp_path / "nope.wav")}])
        ds = GptTtsDataset(str(p))
        assert ds[0] is None


class TestBucketSampler:
    def test_rank_disjoint_and_single_bucket_batches(self):
        lengths = [5, 6, 7, 20, 21, 22, 23, 50, 51, 52, 53, 54]
        all_ids = []
        for rank in range(2):
            s = DistributedBucketSampler(lengths, batch_size=2, boundaries=[0, 10, 40, 100],
                                         num_replicas=2, rank=rank, seed=7)
            for batch in s:
                # batch drawn from one bucket: lengths in same boundary bin
                ls = [lengths[i] for i in batch]
                assert max(ls) <= 10 or (10 < min(ls) and max(ls) <= 40) or min(ls) > 40
                all_ids.extend(batch)
        # every sample covered at least once across ranks (with wrap padding)
        assert set(all_ids) >= set(range(len(lengths))) - {3}  # bucket padding may wrap

    def test_epoch_reshuffles(self):
        lengths = list(range(1, 33))
        s = DistributedBucketSampler(lengths, 4, [0, 16, 40], seed=3)
        b0 = list(s)
        s.set_epoch(1)
        b1 = list(s)
        assert b0 != b1


class TestBucketedMains:
    """_bucketed_batches (train/mains.py): header-only length scan feeding
    DistributedBucketSampler for the GPT/CLVP/diffusion loaders."""

    def _manifest(self, tmp_path, rng, sizes):
        rows = []
        for i, n in enumerate(sizes):
            wav = str(tmp_path / f"{i}.wav")
            if n >= 0:
                save_sidecar(wav, "vq",
                             rng.integers(0, 1024, size=(n,)).astype(np.int32))
            rows.append({"text": "ni3 hao3", "path": wav})
        p = tmp_path / "m.jsonl"
        write_manifest(p, rows)
        return p

    def test_lengths_header_scan(self, tmp_path, rng):
        p = self._manifest(tmp_path, rng, [20, 70, -1, 40])
        ds = GptTtsDataset(str(p))
        assert ds.lengths() == [20, 70, -1, 40]

    def test_batches_are_length_homogeneous(self, tmp_path, rng):
        from ttts_tpu.train.mains import _bucketed_batches

        sizes = [10, 12, 14, 16, 70, 72, 74, 76, -1]
        p = self._manifest(tmp_path, rng, sizes)
        ds = GptTtsDataset(str(p))
        data = _bucketed_batches(ds, batch_size=2, seed=0,
                                 boundaries=range(0, 129, 64))
        loader = data.make_loader(0)
        seen = set()
        for batch in loader:
            lm = batch["mel_codes"].shape[1]
            lens = batch["wav_lengths"] // 1024
            # every item in a batch came from the same 64-wide bucket
            assert (lens <= 64).all() or (lens > 64).all()
            assert lm <= 128
            seen.update(int(x) for x in lens)
        # the missing-sidecar row was dropped, real rows all covered
        assert seen == {10, 12, 14, 16, 70, 72, 74, 76}

    def test_fallback_without_sidecars(self, tmp_path, rng):
        from ttts_tpu.train.mains import _bucketed_batches

        p = self._manifest(tmp_path, rng, [-1, -1])
        ds = GptTtsDataset(str(p))
        data = _bucketed_batches(ds, batch_size=1, seed=0,
                                 boundaries=range(0, 129, 64))
        assert data is not None  # falls back to _simple_batches

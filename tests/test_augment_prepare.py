"""Augmentation + prepare pipeline tests."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.data.audio import save_wav
from ttts_tpu.data.augment import (
    AugmentConfig,
    apply_peq,
    augment_batch,
    peak_centers,
    peaking_equalizer,
    sample_params,
)
from ttts_tpu.data.manifest import read_manifest, write_manifest
from ttts_tpu.data.prepare.pipeline import main as prepare_main

CFG = AugmentConfig(sampling_rate=16000, win_length=512, hop_length=128)


class TestAugment:
    def test_peak_centers_log_spaced(self):
        c = peak_centers(CFG)
        assert len(c) == CFG.num_peak
        ratios = c[1:] / c[:-1]
        np.testing.assert_allclose(ratios, ratios[0], rtol=1e-6)

    def test_zero_gain_is_identity_filter(self):
        resp = peaking_equalizer(jnp.asarray([1000.0]), jnp.asarray([0.0]),
                                 jnp.asarray([3.0]), 16000, 512)
        np.testing.assert_allclose(np.abs(np.asarray(resp)), 1.0, atol=1e-5)

    def test_peq_shapes_and_finiteness(self, rng):
        wavs = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.3)
        p = sample_params(jax.random.key(0), 2, CFG)
        out = apply_peq(wavs, p["quality_power"], p["gain"], CFG)
        assert out.shape[0] == 2
        assert np.isfinite(np.asarray(out)).all()
        assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-6

    def test_augment_batch(self, rng):
        wavs = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32) * 0.3)
        out = augment_batch(jax.random.key(1), wavs, CFG, use_praat=False)
        assert np.isfinite(np.asarray(out)).all()

    def test_boost_changes_band_energy(self, rng):
        # +12 dB at one peak must raise that band's energy vs 0 dB
        t = np.arange(16000) / 16000
        tone = 0.1 * np.sin(2 * np.pi * 1000 * t).astype(np.float32)
        wavs = jnp.asarray(tone[None])
        quality = jnp.full((1, CFG.num_peak + 2), 0.5)
        gain0 = jnp.zeros((1, CFG.num_peak + 2))
        out0 = apply_peq(wavs, quality, gain0, CFG)
        # find the peak nearest 1 kHz and cut it hard
        centers = peak_centers(CFG)
        k = int(np.argmin(np.abs(centers - 1000)))
        gain = gain0.at[0, k].set(-12.0)
        out1 = apply_peq(wavs, quality, gain, CFG)
        # normalized output differs — the cut reshaped the spectrum
        assert not np.allclose(np.asarray(out0), np.asarray(out1), atol=1e-3)


class TestPrepareCLI:
    def test_vad_and_bpe_corpus(self, tmp_path, rng):
        in_dir = tmp_path / "raw"
        in_dir.mkdir()
        sr = 32000
        tone = 0.4 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)
        x = np.concatenate([tone, np.zeros(sr), tone]).astype(np.float32)
        save_wav(in_dir / "a.wav", x, sr)
        out_dir = tmp_path / "clips"
        prepare_main(["vad", "--in-dir", str(in_dir), "--out-dir", str(out_dir)])
        clips = list(out_dir.glob("*.wav"))
        assert len(clips) == 2

        m = tmp_path / "m.jsonl"
        write_manifest(m, [{"text": "ni3 hao3", "path": str(clips[0])}])
        corpus = tmp_path / "bpe.txt"
        prepare_main(["bpe-corpus", str(m), "--out", str(corpus)])
        assert "ni3 hao3" in corpus.read_text()

    def test_mel_sidecar(self, tmp_path, rng):
        wav_p = tmp_path / "b.wav"
        save_wav(wav_p, rng.standard_normal(24000).astype(np.float32) * 0.1, 24000)
        m = tmp_path / "m.jsonl"
        write_manifest(m, [{"text": "x", "path": str(wav_p)}])
        prepare_main(["mel", "--manifest", str(m)])
        mel = np.load(str(wav_p) + ".mel.npy")
        assert mel.shape[0] == 100  # (100, T)
        assert np.isfinite(mel).all()

    def test_filter_noise(self, tmp_path):
        m = tmp_path / "m.jsonl"
        write_manifest(m, [{"text": "a", "path": "/x/1.wav"},
                           {"text": "b", "path": "/x/2.wav"}])
        nf = tmp_path / "noise.txt"
        nf.write_text("/x/2.wav\n")
        out = tmp_path / "out.jsonl"
        prepare_main(["filter-noise", "--manifest", str(m),
                      "--noise-files", str(nf), "--out", str(out)])
        rows = read_manifest(out)
        assert len(rows) == 1 and rows[0]["path"] == "/x/1.wav"

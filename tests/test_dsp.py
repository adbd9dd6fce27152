"""DSP parity tests.

Golden references are computed with torch (CPU) reproducing the reference
semantics (torch.stft is an independent C++ implementation, so this genuinely
validates our framing/FFT math):
  - VITS spectrogram: ttts/utils/data_utils.py:52-87
  - acoustic mel STFT: torchaudio MelSpectrogram center=True power=1
    (ttts/vocoder/feature_extractors.py:28-49)
  - ISTFT: ttts/vocoder/spectral_ops.py:7-76 (round-trip property here)
Mel filterbanks and resampling are validated by analytic properties since
librosa/torchaudio are unavailable in this image.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ttts_tpu.ops import (
    acoustic_mel_spectrogram,
    istft,
    mel_filterbank,
    resample,
    stft,
    vits_spectrogram,
)
from ttts_tpu.ops.mel import _hz_to_mel, _mel_to_hz


def _torch_vits_spec(y_np, n_fft, hop, win):
    """torch golden for reference spectrogram_torch (data_utils.py:52-87)."""
    y = torch.from_numpy(y_np)
    pad = int((n_fft - hop) / 2)
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        y,
        n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=False,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    spec = torch.view_as_real(spec)
    return torch.sqrt(spec.pow(2).sum(-1) + 1e-6).numpy()


class TestSTFT:
    def test_stft_matches_torch_center_false(self, rng):
        y = rng.standard_normal((2, 8192)).astype(np.float32)
        n_fft, hop = 1024, 256
        ours = stft(jnp.asarray(y), n_fft, hop, n_fft, center=False)
        theirs = torch.stft(
            torch.from_numpy(y),
            n_fft,
            hop_length=hop,
            window=torch.hann_window(n_fft),
            center=False,
            onesided=True,
            return_complex=True,
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-3, rtol=1e-4)

    def test_stft_matches_torch_center_true(self, rng):
        y = rng.standard_normal((1, 4096)).astype(np.float32)
        n_fft, hop = 512, 128
        ours = stft(jnp.asarray(y), n_fft, hop, n_fft, center=True)
        theirs = torch.stft(
            torch.from_numpy(y),
            n_fft,
            hop_length=hop,
            window=torch.hann_window(n_fft),
            center=True,
            pad_mode="reflect",
            onesided=True,
            return_complex=True,
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-3, rtol=1e-4)

    def test_vits_spectrogram_matches_reference_math(self, rng):
        # codec config: 32 kHz, n_fft 2048, hop 640 (ttts/vqvae/config.json)
        y = rng.standard_normal((2, 32000)).astype(np.float32) * 0.5
        ours = np.asarray(vits_spectrogram(jnp.asarray(y), 2048, 640, 2048))
        golden = _torch_vits_spec(y, 2048, 640, 2048)
        assert ours.shape == golden.shape
        np.testing.assert_allclose(ours, golden, atol=1e-3, rtol=1e-3)

    def test_istft_roundtrip_same_padding(self, rng):
        # Vocos config: n_fft 1024, hop 256, padding "same"
        n_fft, hop = 1024, 256
        y = rng.standard_normal((2, 256 * 40)).astype(np.float32)
        pad = (n_fft - hop) // 2
        ypad = np.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        spec = stft(jnp.asarray(ypad), n_fft, hop, n_fft, center=False)
        rec = np.asarray(istft(spec, n_fft, hop, n_fft, padding="same"))
        # interior must reconstruct exactly (NOLA); edges are trimmed
        assert rec.shape == y.shape
        np.testing.assert_allclose(rec[:, hop:-hop], y[:, hop:-hop], atol=1e-4)


class TestMel:
    def test_htk_scale_known_points(self):
        # htk: mel(700 Hz) = 2595*log10(2)
        assert np.isclose(_hz_to_mel(700.0, "htk"), 2595.0 * np.log10(2.0))
        assert np.isclose(_mel_to_hz(_hz_to_mel(1234.5, "htk"), "htk"), 1234.5)

    def test_slaney_scale_breakpoint(self):
        # slaney is linear f/(200/3) below 1 kHz, log above; continuous at 1 kHz
        assert np.isclose(_hz_to_mel(999.999, "slaney"), 15.0, atol=1e-3)
        assert np.isclose(_mel_to_hz(_hz_to_mel(5000.0, "slaney"), "slaney"), 5000.0)
        assert np.isclose(_hz_to_mel(500.0, "slaney"), 500.0 / (200.0 / 3))

    def test_filterbank_shape_and_triangles(self):
        fb = mel_filterbank(24000, 1024, 100, scale="htk", norm=None)
        assert fb.shape == (100, 513)
        # unnormalized triangles peak at ~1
        assert fb.max() <= 1.0 + 1e-6
        assert (fb >= 0).all()
        # every filter has support
        assert (fb.sum(axis=1) > 0).all()

    def test_filterbank_slaney_norm(self):
        fb = mel_filterbank(32000, 2048, 128, scale="slaney", norm="slaney")
        # slaney norm: each triangle integrates (in Hz) to ~2/(width)*area = 1
        freqs = np.linspace(0, 16000, 1025)
        df = freqs[1] - freqs[0]
        areas = fb.sum(axis=1) * df
        np.testing.assert_allclose(areas, 1.0, atol=0.1)

    def test_acoustic_mel_shape_and_finiteness(self, rng):
        audio = rng.standard_normal((2, 24000)).astype(np.float32) * 0.3
        mel = np.asarray(acoustic_mel_spectrogram(jnp.asarray(audio)))
        # center=True → frames = 1 + T//hop
        assert mel.shape == (2, 100, 1 + 24000 // 256)
        assert np.isfinite(mel).all()
        # silence maps to log(clip) floor = log(1e-7)
        sil = np.asarray(acoustic_mel_spectrogram(jnp.zeros((1, 24000))))
        np.testing.assert_allclose(sil, np.log(1e-7), atol=1e-5)


class TestResample:
    @pytest.mark.parametrize("sr_in,sr_out", [(32000, 24000), (44100, 32000), (16000, 24000)])
    def test_sine_preserved(self, sr_in, sr_out):
        t = np.arange(sr_in) / sr_in  # 1 second
        f0 = 440.0
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x[None]), sr_in, sr_out))[0]
        assert abs(y.shape[0] - sr_out) <= 1
        # compare against ideal sine, ignoring filter edges
        ty = np.arange(y.shape[0]) / sr_out
        ref = np.sin(2 * np.pi * f0 * ty)
        m = slice(200, -200)
        err = np.abs(y[m] - ref[m]).max()
        assert err < 5e-3

    def test_identity(self, rng):
        x = rng.standard_normal((3, 1000)).astype(np.float32)
        y = resample(jnp.asarray(x), 24000, 24000)
        np.testing.assert_array_equal(np.asarray(y), x)


class TestMelFilterbankGolden:
    """Independent check of ops.mel.mel_filterbank.

    tests/refshim.py makes the reference's librosa delegate to OUR
    filterbank, so cross-parity tests cannot catch a filterbank bug (both
    sides would share it). This class breaks that circularity with (a) a
    from-scratch in-test port of librosa.filters.mel's published algorithm
    (mel_frequencies slaney breakpoints + outer-difference triangles +
    slaney area norm) and (b) analytically pinned constants of the slaney
    scale itself."""

    @staticmethod
    def _librosa_mel(sr, n_fft, n_mels, fmin=0.0, fmax=None, htk=False,
                     norm="slaney"):
        fmax = sr / 2 if fmax is None else fmax

        def hz_to_mel(f):
            f = np.asarray(f, np.float64)
            if htk:
                return 2595.0 * np.log10(1.0 + f / 700.0)
            out = f * 3.0 / 200.0
            log_t = f >= 1000.0
            out = np.where(log_t, 15.0 + np.log(np.where(log_t, f, 1000.0) / 1000.0)
                           / (np.log(6.4) / 27.0), out)
            return out

        def mel_to_hz(m):
            m = np.asarray(m, np.float64)
            if htk:
                return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
            out = m * 200.0 / 3.0
            log_t = m >= 15.0
            return np.where(log_t, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), out)

        mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
        fftfreqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
        fdiff = np.diff(mel_f)
        ramps = np.subtract.outer(mel_f, fftfreqs)
        weights = np.zeros((n_mels, 1 + n_fft // 2))
        for i in range(n_mels):
            lower = -ramps[i] / fdiff[i]
            upper = ramps[i + 2] / fdiff[i + 1]
            weights[i] = np.maximum(0, np.minimum(lower, upper))
        if norm == "slaney":
            weights *= (2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels]))[:, None]
        return weights

    def test_slaney_codec_config(self):
        # the VITS codec filterbank (32 kHz, n_fft 2048, 128 mel)
        ours = mel_filterbank(32000, 2048, 128)
        ref = self._librosa_mel(32000, 2048, 128)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-7)

    def test_htk_acoustic_config(self):
        # the torchaudio acoustic filterbank (24 kHz, n_fft 1024, 100 mel, htk)
        ours = mel_filterbank(24000, 1024, 100, scale="htk", norm=None)
        ref = self._librosa_mel(24000, 1024, 100, htk=True, norm=None)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-7)

    def test_slaney_scale_pinned_constants(self):
        """Analytic facts of the slaney scale, independent of any
        implementation: linear 200/3 Hz-per-mel below 1 kHz (so mel(1000)=15,
        mel(500)=7.5), exactly log above with step ln(6.4)/27 (so
        hz(15+27)=6400, hz(15+13.5)=sqrt(6.4)*1000)."""
        from ttts_tpu.ops.mel import _hz_to_mel, _mel_to_hz

        assert abs(_hz_to_mel(1000.0, "slaney") - 15.0) < 1e-12
        assert abs(_hz_to_mel(500.0, "slaney") - 7.5) < 1e-12
        assert abs(_mel_to_hz(42.0, "slaney") - 6400.0) < 1e-8
        assert abs(_mel_to_hz(28.5, "slaney") - 1000.0 * np.sqrt(6.4)) < 1e-8
        # htk: mel(700 Hz) = 2595*log10(2)
        assert abs(_hz_to_mel(700.0, "htk") - 2595.0 * np.log10(2.0)) < 1e-10

    def test_row_sums_with_slaney_norm(self):
        """Each slaney-normalized triangle integrates to ~2/(hz width) ×
        area ⇒ the weighted row sum approximates 1 at fine FFT resolution
        (a well-known librosa property, coarse bound)."""
        fb = np.asarray(mel_filterbank(16000, 4096, 40))
        sums = fb.sum(axis=1) * (8000.0 / (4096 // 2))
        assert np.all(sums > 0.9) and np.all(sums < 1.1)


class TestOverlapAdd:
    """ops/stft.py overlap_add: the dense shifted-adds fast path (W a
    multiple of hop — every in-tree user) must match the general scatter
    formulation exactly."""

    def _scatter_ref(self, frames, hop):
        b, t, w = frames.shape
        out = np.zeros((b, (t - 1) * hop + w), frames.dtype)
        for i in range(t):
            out[:, i * hop : i * hop + w] += frames[:, i]
        return out

    def test_dense_matches_scatter(self):
        from ttts_tpu.ops.stft import overlap_add

        rng = np.random.default_rng(0)
        for b, t, w, hop in [(2, 7, 8, 4), (1, 5, 16, 4), (3, 9, 12, 3)]:
            frames = rng.standard_normal((b, t, w)).astype(np.float32)
            got = np.asarray(overlap_add(jnp.asarray(frames), hop))
            np.testing.assert_allclose(got, self._scatter_ref(frames, hop),
                                       rtol=0, atol=1e-5)

    def test_non_multiple_fallback(self):
        from ttts_tpu.ops.stft import overlap_add

        rng = np.random.default_rng(1)
        frames = rng.standard_normal((2, 6, 10)).astype(np.float32)  # 10 % 4 != 0
        got = np.asarray(overlap_add(jnp.asarray(frames), 4))
        np.testing.assert_allclose(got, self._scatter_ref(frames, 4),
                                   rtol=0, atol=1e-5)


class TestStftConvImpl:
    """The MXU windowed-DFT conv STFT must match the gather+rfft path to
    float32 roundoff — it is the default on accelerators, while CPU (and so
    every golden test here) runs the fft path."""

    @pytest.mark.parametrize("n_fft,hop,win", [(512, 128, 512),
                                               (1024, 256, 1024),
                                               (2048, 640, 2048),
                                               (1024, 256, 768)])
    def test_conv_matches_fft(self, n_fft, hop, win):
        from ttts_tpu.ops.stft import stft

        rng = np.random.default_rng(3)
        y = jnp.asarray(rng.standard_normal((2, 4 * n_fft)).astype(np.float32))
        a = np.asarray(stft(y, n_fft, hop, win, center=True, impl="conv"))
        b = np.asarray(stft(y, n_fft, hop, win, center=True, impl="fft"))
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-4 * scale)

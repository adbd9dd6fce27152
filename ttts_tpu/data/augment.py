"""NANSY-style waveform perturbation for the codec's augmented branch.

Rebuild of ttts/vqvae/augment/: STFT → parametric EQ (biquad peaking +
shelving filters applied as frequency responses, peq.py:6-120) → ISTFT →
peak-normalize → optional Praat formant/pitch warp (praat.py:26). Parameter
sampling and the NaN-retry loop mirror ttts/vqvae/train.py:62-116 (formant
1.4, pitch 2.0, pitch-range 1.5, 8 peaks in [60, 10 kHz], q∈[2,5],
gain∈[−12,12] dB — vqvae/config.json train block).

The EQ path is pure JAX (jit-friendly, runs on device); Praat is a host
dependency (parselmouth) applied via callback when available — exactly the
boundary the reference has (the praat call is CPU-side numpy there too).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.ops.stft import hann_window, istft, stft

try:  # optional host dependency
    import parselmouth  # type: ignore

    HAVE_PRAAT = True
except ImportError:  # pragma: no cover
    HAVE_PRAAT = False


class AugmentConfig(NamedTuple):
    sampling_rate: int = 32000
    win_length: int = 2048
    hop_length: int = 640
    cutoff_lowpass: float = 60.0
    cutoff_highpass: float = 10000.0
    q_min: float = 2.0
    q_max: float = 5.0
    num_peak: int = 8
    g_min: float = -12.0
    g_max: float = 12.0
    formant_shift: float = 1.4
    pitch_shift: float = 2.0
    pitch_range: float = 1.5


# ---------------------------------------------------------------- biquads
# RBJ Audio-EQ-Cookbook responses evaluated on the rFFT grid (peq.py biquad:
# rfft(b)/rfft(a)).


def _biquad_response(b, a, n_fft: int):
    fir = jnp.fft.rfft(b, n_fft, axis=-1)
    iir = jnp.fft.rfft(a, n_fft, axis=-1)
    return fir / iir


def peaking_equalizer(center, gain_db, q, sr: int, n_fft: int):
    """center/gain/q: (...,) → response (..., n_fft//2+1)."""
    A = 10.0 ** (gain_db / 40.0)
    w0 = 2 * math.pi * center / sr
    alpha = jnp.sin(w0) / (2 * q)
    cos = jnp.cos(w0)
    b = jnp.stack(jnp.broadcast_arrays(1 + alpha * A, -2 * cos, 1 - alpha * A), axis=-1)
    a = jnp.stack(jnp.broadcast_arrays(1 + alpha / A, -2 * cos, 1 - alpha / A), axis=-1)
    return _biquad_response(b, a, n_fft)


def _shelving(cutoff, gain_db, q, sr: int, n_fft: int, low: bool):
    A = 10.0 ** (gain_db / 40.0)
    w0 = 2 * math.pi * cutoff / sr
    cos = jnp.cos(w0)
    alpha = jnp.sin(w0) / (2 * q)
    two_sqrtA_alpha = 2 * jnp.sqrt(A) * alpha
    if low:
        b0 = A * ((A + 1) - (A - 1) * cos + two_sqrtA_alpha)
        b1 = 2 * A * ((A - 1) - (A + 1) * cos)
        b2 = A * ((A + 1) - (A - 1) * cos - two_sqrtA_alpha)
        a0 = (A + 1) + (A - 1) * cos + two_sqrtA_alpha
        a1 = -2 * ((A - 1) + (A + 1) * cos)
        a2 = (A + 1) + (A - 1) * cos - two_sqrtA_alpha
    else:
        b0 = A * ((A + 1) + (A - 1) * cos + two_sqrtA_alpha)
        b1 = -2 * A * ((A - 1) + (A + 1) * cos)
        b2 = A * ((A + 1) + (A - 1) * cos - two_sqrtA_alpha)
        a0 = (A + 1) - (A - 1) * cos + two_sqrtA_alpha
        a1 = 2 * ((A - 1) - (A + 1) * cos)
        a2 = (A + 1) - (A - 1) * cos - two_sqrtA_alpha
    b = jnp.stack([b0, b1, b2], axis=-1)
    a = jnp.stack([a0, a1, a2], axis=-1)
    return _biquad_response(b, a, n_fft)


def low_shelving(cutoff, gain_db, q, sr, n_fft):
    return _shelving(cutoff, gain_db, q, sr, n_fft, low=True)


def high_shelving(cutoff, gain_db, q, sr, n_fft):
    return _shelving(cutoff, gain_db, q, sr, n_fft, low=False)


# ----------------------------------------------------------------- augment


def peak_centers(cfg: AugmentConfig) -> np.ndarray:
    """num_peak log-spaced centers between the cutoffs (augment/__init__.py:28-35)."""
    f_min, f_max, peaks = cfg.cutoff_lowpass, cfg.cutoff_highpass, cfg.num_peak
    idx = np.arange(peaks + 2)[1:-1]
    return f_min * (f_max / f_min) ** (idx / (peaks + 1))


def sample_params(key, batch: int, cfg: AugmentConfig):
    """Random augmentation parameters (vqvae/train.py:62-99 semantics:
    shift factors sampled in [1, max] then inverted for half the draws)."""
    ks = jax.random.split(key, 5)

    def shift(k, max_val):
        v = jax.random.uniform(k, (batch,), minval=1.0, maxval=max_val)
        inv = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.5, (batch,))
        return jnp.where(inv, 1.0 / v, v)

    return {
        "formant_shift": shift(ks[0], cfg.formant_shift),
        "pitch_shift": shift(ks[1], cfg.pitch_shift),
        "pitch_range": shift(ks[2], cfg.pitch_range),
        "quality_power": jax.random.uniform(ks[3], (batch, cfg.num_peak + 2)),
        "gain": jax.random.uniform(ks[4], (batch, cfg.num_peak + 2),
                                   minval=cfg.g_min, maxval=cfg.g_max),
    }


def apply_peq(wavs: jax.Array, quality_power: jax.Array, gain: jax.Array,
              cfg: AugmentConfig) -> jax.Array:
    """STFT-domain parametric EQ (augment/__init__.py:56-100). wavs: (B, T)."""
    n = cfg.win_length
    spec = stft(wavs, n, cfg.hop_length, n, center=True)  # (B, F, T')
    q = cfg.q_min * (cfg.q_max / cfg.q_min) ** quality_power  # (B, P+2)
    centers = jnp.asarray(peak_centers(cfg))[None]  # (1, P)
    peaks = jnp.prod(
        peaking_equalizer(centers, gain[:, :-2], q[:, :-2], cfg.sampling_rate, n),
        axis=1,
    )  # (B, F)
    lowpass = low_shelving(cfg.cutoff_lowpass, gain[:, -2], q[:, -2], cfg.sampling_rate, n)
    highpass = high_shelving(cfg.cutoff_highpass, gain[:, -1], q[:, -1], cfg.sampling_rate, n)
    filters = peaks * highpass * lowpass
    spec = spec * filters[:, :, None]
    out = istft(spec, n, cfg.hop_length, n, padding="center")
    out = jnp.clip(out, -1.0, 1.0)
    return out / jnp.maximum(jnp.max(jnp.abs(out), axis=-1, keepdims=True), 1e-7)


def praat_augment(wav: np.ndarray, sr: int, formant_shift: float,
                  pitch_shift: float, pitch_range: float) -> np.ndarray:
    """Praat 'Change gender' warp (augment/praat.py:26). Host-side; identity
    when parselmouth is unavailable."""
    if not HAVE_PRAAT:
        return wav
    snd = parselmouth.Sound(wav.astype(np.float64), sampling_frequency=sr)
    pitch = parselmouth.praat.call(snd, "To Pitch", 0.8 / 75, 75, 600)
    ndpit = pitch.selected_array["frequency"]
    nonzero = ndpit[ndpit > 1e-5]
    pitch_median = float(np.median(nonzero)) if len(nonzero) else 0.0
    out = parselmouth.praat.call(
        (snd, pitch), "Change gender", formant_shift,
        pitch_median * pitch_shift, pitch_range, 1.0,
    )
    return np.asarray(out.values)[0].astype(np.float32)


def augment_batch(key, wavs: jax.Array, cfg: AugmentConfig,
                  use_praat: bool = True, max_retries: int = 4) -> jax.Array:
    """Full augmentation with NaN-retry (vqvae/train.py:100-116): resample
    parameters until the output is finite. wavs: (B, T)."""
    out = None
    for attempt in range(max_retries):
        p = sample_params(jax.random.fold_in(key, attempt), wavs.shape[0], cfg)
        cand = apply_peq(wavs, p["quality_power"], p["gain"], cfg)
        if use_praat and HAVE_PRAAT:
            host = np.asarray(cand)
            host = np.stack([
                praat_augment(host[i], cfg.sampling_rate,
                              float(p["formant_shift"][i]),
                              float(p["pitch_shift"][i]),
                              float(p["pitch_range"][i]))[: host.shape[1]]
                for i in range(host.shape[0])
            ])
            cand = jnp.asarray(host)
        ok = bool(jnp.isfinite(cand).all())
        if ok:
            return cand
        out = cand
    return jnp.nan_to_num(out if out is not None else wavs)

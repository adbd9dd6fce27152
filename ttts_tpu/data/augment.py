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

from ttts_tpu.ops.stft import hann_window, istft, overlap_add, stft

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


# ------------------------------------------------- formant/pitch warp (host)
# Praat-free implementation of the 'Change gender' behavior class
# (augment/praat.py:26): constant-ratio pitch shift (phase-vocoder stretch +
# resample) plus cepstral spectral-envelope warp for the formant factor.
# Pure numpy, host-side — the same process boundary as the reference's
# parselmouth call (CPU per sample). Praat remains the optional exact path.


def _stft_np(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None] + hop * np.arange(n_frames)[:, None]
    return np.fft.rfft(x[idx] * win, axis=-1).T  # (F, T)


def _istft_np(S: np.ndarray, n_fft: int, hop: int, length: int) -> np.ndarray:
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    frames = np.fft.irfft(S.T, n=n_fft, axis=-1) * win
    t = S.shape[1]
    out = np.zeros(n_fft + hop * (t - 1))
    norm = np.zeros_like(out)
    for i in range(t):  # overlap-add (host path, small clips)
        out[i * hop : i * hop + n_fft] += frames[i]
        norm[i * hop : i * hop + n_fft] += win**2
    out = out / np.maximum(norm, 1e-8)
    pad = n_fft // 2
    return out[pad : pad + length]


def _phase_vocoder(S: np.ndarray, rate: float, n_fft: int, hop: int) -> np.ndarray:
    """Classic PV time-stretch: output has T/rate frames at unchanged pitch."""
    f, t = S.shape
    steps = np.arange(0, t, rate)
    Sp = np.pad(S, ((0, 0), (0, 2)))
    idx = steps.astype(np.int64)
    frac = (steps - idx)[None, :]
    mag = (1 - frac) * np.abs(Sp[:, idx]) + frac * np.abs(Sp[:, idx + 1])
    phi_adv = (2 * np.pi * hop * np.arange(f) / n_fft)[:, None]
    dphase = np.angle(Sp[:, idx + 1]) - np.angle(Sp[:, idx]) - phi_adv
    dphase -= 2 * np.pi * np.round(dphase / (2 * np.pi))
    # accumulated synthesis phase: start at the first analysis phase
    inc = phi_adv + dphase
    phase = np.angle(S[:, :1]) + np.concatenate(
        [np.zeros((f, 1)), np.cumsum(inc[:, :-1], axis=1)], axis=1
    )
    return mag * np.exp(1j * phase)


def _pitch_shift_np(x: np.ndarray, factor: float, n_fft: int = 1024,
                    hop: int = 256) -> np.ndarray:
    """Shift pitch (and formants) by `factor`, duration preserved: PV stretch
    to length·factor, then resample back to the original length."""
    S = _stft_np(x, n_fft, hop)
    S2 = _phase_vocoder(S, 1.0 / factor, n_fft, hop)
    y = _istft_np(S2, n_fft, hop, int(round(len(x) * factor)))
    pos = np.arange(len(x)) * (len(y) - 1) / max(len(x) - 1, 1)
    return np.interp(pos, np.arange(len(y)), y)


def _formant_warp_np(x: np.ndarray, factor: float, n_fft: int = 1024,
                     hop: int = 256, lifter: int = 32) -> np.ndarray:
    """Scale the spectral envelope's frequency axis by `factor` (cepstral
    lifter envelope; excitation/pitch untouched)."""
    S = _stft_np(x, n_fft, hop)
    f = S.shape[0]
    logm = np.log(np.abs(S) + 1e-8)
    cep = np.fft.irfft(logm, axis=0)
    cep[lifter:-lifter] = 0.0
    env = np.fft.rfft(cep, n=2 * (f - 1), axis=0).real[:f]
    src = np.arange(f) / factor  # env_w[k] = env[k/factor]
    lo = np.clip(src.astype(np.int64), 0, f - 2)
    fr = np.clip(src - lo, 0.0, 1.0)[:, None]
    env_w = (1 - fr) * env[lo] + fr * env[lo + 1]
    S2 = S * np.exp(env_w - env)
    return _istft_np(S2, n_fft, hop, len(x))


def spectral_gender_warp(wav: np.ndarray, sr: int, formant_shift: float,
                         pitch_shift: float, pitch_range: float = 1.0) -> np.ndarray:
    """Praat-free 'Change gender': pitch ×pitch_shift, formants
    ×formant_shift, duration preserved. pitch_range (the variance scale
    around the median) is a Praat-only refinement — the constant-ratio shift
    covers the augmentation's behavior class (NANSY perturbs identity, not
    prosody precision)."""
    y = np.asarray(wav, np.float64)
    p = float(pitch_shift)
    if abs(p - 1.0) > 1e-3:
        y = _pitch_shift_np(y, p)
    g = float(formant_shift) / p  # pitch shift already scaled formants by p
    if abs(g - 1.0) > 1e-3:
        y = _formant_warp_np(y, g)
    peak = np.max(np.abs(y))
    if peak > 1.0:
        y = y / peak
    return y.astype(np.float32)


def praat_augment(wav: np.ndarray, sr: int, formant_shift: float,
                  pitch_shift: float, pitch_range: float) -> np.ndarray:
    """Praat 'Change gender' warp (augment/praat.py:26). Host-side; falls
    back to the numpy spectral warp when parselmouth is unavailable."""
    if not HAVE_PRAAT:
        return spectral_gender_warp(wav, sr, formant_shift, pitch_shift, pitch_range)
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


def warp_batch_np(rng: "np.random.Generator", wavs: np.ndarray,
                  cfg: AugmentConfig, max_retries: int = 4,
                  workers: int = 8) -> np.ndarray:
    """Host-side formant/pitch warp for a (B, T) batch with the reference's
    parameter sampling + NaN-retry (vqvae/train.py:62-116). Runs in loader
    threads, off the jit path — the reference's praat call is CPU-side too.

    Clips are warped CONCURRENTLY (per-clip child RNGs keep determinism):
    the warp runs in the single collate/producer thread, and serializing
    B× (STFT + phase-vocoder + overlap-add) there starves the accelerator.
    numpy's pocketfft releases the GIL, so threads give real speedup — but
    ONLY on the numpy fallback path: when parselmouth is installed,
    praat_augment drives the Praat interpreter, whose global state is not
    thread-safe, so the warp runs serially there."""
    from concurrent.futures import ThreadPoolExecutor

    n = wavs.shape[0]
    if n == 0:
        return np.empty_like(wavs)
    if HAVE_PRAAT:
        workers = 1
    try:
        child = rng.spawn(n)
    except AttributeError:  # numpy < 1.25
        child = [np.random.default_rng(int(rng.integers(2**63)))
                 for _ in range(n)]
    t = wavs.shape[1]
    out = np.empty_like(wavs)

    def one(i: int):
        r = child[i]

        def shift(mx: float) -> float:
            v = r.uniform(1.0, mx)
            return 1.0 / v if r.random() < 0.5 else v

        y = wavs[i]
        for _ in range(max_retries):
            cand = praat_augment(
                wavs[i], cfg.sampling_rate, shift(cfg.formant_shift),
                shift(cfg.pitch_shift), shift(cfg.pitch_range),
            )
            if np.isfinite(cand).all():
                y = cand
                break
        y = y[:t]
        out[i, : len(y)] = y
        out[i, len(y):] = 0.0

    if workers <= 1:
        for i in range(n):
            one(i)
        return out
    with ThreadPoolExecutor(max_workers=min(workers, n)) as pool:
        list(pool.map(one, range(n)))
    return out


def augment_batch(key, wavs: jax.Array, cfg: AugmentConfig,
                  use_praat: bool = True, max_retries: int = 4) -> jax.Array:
    """Full augmentation with NaN-retry (vqvae/train.py:100-116): resample
    parameters until the output is finite. wavs: (B, T)."""
    out = None
    for attempt in range(max_retries):
        p = sample_params(jax.random.fold_in(key, attempt), wavs.shape[0], cfg)
        cand = apply_peq(wavs, p["quality_power"], p["gain"], cfg)
        if use_praat:  # Praat when available, numpy spectral warp otherwise
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


# --------------------------------------------- formant/pitch warp (device)
# jit-safe port of spectral_gender_warp: same math as the numpy host path
# (phase-vocoder pitch stretch + resample, cepstral-envelope formant warp)
# with STATIC shapes — the pitch stretch renders onto a ceil(max_factor)×
# frame budget and the final resample reads only the valid prefix, so any
# factor ≤ cfg.pitch_shift traces to ONE program. Measured motivation
# (scripts/bench_loader.py): the host warp sustains ~32 audio-s/s on one
# core vs the GAN step's ~296 audio-s/s consumption; on device the warp is
# a few extra rffts inside the already-compiled train step.


def _stft_j(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    # periodic-hann center STFT; ops/stft.py routes it through the windowed-
    # DFT strided conv on accelerators (MXU) and gather+rfft on CPU
    return stft(x[None], n_fft, hop, center=True)[0]  # (F, T)


def _istft_j(S: jax.Array, n_fft: int, hop: int, length: int,
             frame_valid: Optional[jax.Array] = None) -> jax.Array:
    """frame_valid (T,) masks frames out of BOTH the signal and the window-
    squared normalization — junk frames past a stretched signal's end would
    otherwise bleed into the valid tail through window overlap."""
    win = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n_fft) / n_fft)
    frames = jnp.fft.irfft(S.T, n=n_fft, axis=-1) * win
    t = S.shape[1]
    valid = jnp.ones((t,)) if frame_valid is None else frame_valid.astype(frames.dtype)
    frames = frames * valid[:, None]
    # dense shifted-adds overlap-add (ops/stft.py overlap_add): the previous
    # t·n_fft-index scatter-add serializes on the TPU scatter unit and made
    # this ISTFT — called twice per clip by the NANSY warp, vmapped over the
    # GAN batch — half the whole train step (scripts/bench_gan_dsp.py).
    # The norm envelope depends on the dynamic frame_valid mask, so it is
    # overlap-added the same way rather than precomputed on host.
    out = overlap_add(frames[None], hop)[0]
    norm = overlap_add((valid[:, None] * (win**2)[None, :])[None], hop)[0]
    out = out / jnp.maximum(norm, 1e-8)
    pad = n_fft // 2
    return out[pad : pad + length]


def _phase_vocoder_j(S: jax.Array, rate: jax.Array, n_fft: int, hop: int,
                     t_out: int) -> jax.Array:
    """PV time-stretch onto a fixed t_out-frame grid; frames past the
    stretched end carry junk that the caller's resample never reads."""
    f, t = S.shape
    steps = jnp.arange(t_out) * rate
    idx = jnp.clip(steps.astype(jnp.int32), 0, t - 1)
    idx1 = jnp.clip(idx + 1, 0, t - 1)
    frac = (steps - idx)[None, :]
    mag = (1 - frac) * jnp.abs(S[:, idx]) + frac * jnp.abs(S[:, idx1])
    phi_adv = (2 * jnp.pi * hop * jnp.arange(f) / n_fft)[:, None]
    dphase = jnp.angle(S[:, idx1]) - jnp.angle(S[:, idx]) - phi_adv
    dphase -= 2 * jnp.pi * jnp.round(dphase / (2 * jnp.pi))
    inc = phi_adv + dphase
    # wrap increments into (-π, π] BEFORE the cumsum: phases only matter
    # mod 2π, and the unwrapped sum grows to ~1e6 rad over thousands of
    # frames — past float32 resolution (the host path hides this in f64)
    inc -= 2 * jnp.pi * jnp.round(inc / (2 * jnp.pi))
    phase = jnp.angle(S[:, :1]) + jnp.concatenate(
        [jnp.zeros((f, 1)), jnp.cumsum(inc[:, :-1], axis=1)], axis=1)
    return mag * jnp.exp(1j * phase)


def _pitch_shift_j(x: jax.Array, factor: jax.Array, max_factor: float,
                   n_fft: int = 1024, hop: int = 256) -> jax.Array:
    length = x.shape[0]
    budget = int(np.ceil(max_factor))
    S = _stft_j(x, n_fft, hop)
    t_out = budget * S.shape[1]
    S2 = _phase_vocoder_j(S, 1.0 / factor, n_fft, hop, t_out)
    # frames past the stretched end are clamped repeats — exclude them
    valid = jnp.arange(t_out) * (1.0 / factor) <= S.shape[1] - 1
    y = _istft_j(S2, n_fft, hop, budget * length, frame_valid=valid)
    y_len = jnp.round(length * factor)
    pos = jnp.arange(length) * (y_len - 1.0) / max(length - 1, 1)
    lo = jnp.clip(pos.astype(jnp.int32), 0, budget * length - 2)
    fr = jnp.clip(pos - lo, 0.0, 1.0)
    return (1 - fr) * y[lo] + fr * y[lo + 1]


def _formant_warp_j(x: jax.Array, factor: jax.Array, n_fft: int = 1024,
                    hop: int = 256, lifter: int = 32) -> jax.Array:
    S = _stft_j(x, n_fft, hop)
    f = S.shape[0]
    logm = jnp.log(jnp.abs(S) + 1e-8)
    cep = jnp.fft.irfft(logm, axis=0)
    keep = (jnp.arange(cep.shape[0]) < lifter) | (
        jnp.arange(cep.shape[0]) >= cep.shape[0] - lifter)
    cep = cep * keep[:, None]
    env = jnp.fft.rfft(cep, n=2 * (f - 1), axis=0).real[:f]
    src = jnp.arange(f) / factor
    lo = jnp.clip(src.astype(jnp.int32), 0, f - 2)
    fr = jnp.clip(src - lo, 0.0, 1.0)[:, None]
    env_w = (1 - fr) * env[lo] + fr * env[lo + 1]
    S2 = S * jnp.exp(env_w - env)
    return _istft_j(S2, n_fft, hop, x.shape[0])


def gender_warp_j(wav: jax.Array, formant_shift: jax.Array,
                  pitch_shift: jax.Array, max_pitch: float) -> jax.Array:
    """Device 'Change gender' for one (T,) clip: pitch ×pitch_shift,
    formants ×formant_shift, duration preserved. Stages are computed
    unconditionally (one trace) but selected out at factor≈1, matching the
    host path's skip threshold — a phase vocoder applied at rate≈1 still
    decoheres phase, so 'skip' and 'apply' differ audibly there."""
    y_p = _pitch_shift_j(wav, pitch_shift, max_pitch)
    y = jnp.where(jnp.abs(pitch_shift - 1.0) > 1e-3, y_p, wav)
    g = formant_shift / pitch_shift
    y_f = _formant_warp_j(y, g)
    y = jnp.where(jnp.abs(g - 1.0) > 1e-3, y_f, y)
    peak = jnp.max(jnp.abs(y))
    return jnp.where(peak > 1.0, y / peak, y)


def warp_batch_device(key: jax.Array, wavs: jax.Array,
                      cfg: AugmentConfig) -> jax.Array:
    """In-jit NANSY formant/pitch warp for a (B, T) batch.

    Per-clip factor sampling mirrors warp_batch_np's shift(): v ~ U(1, mx),
    inverted with probability ½. Non-finite outputs fall back to the
    unwarped clip (the reference's NaN-retry guarded Praat edge cases,
    vqvae/train.py:100-116; the spectral path is deterministic, so one
    attempt + fallback covers the same contract)."""
    b = wavs.shape[0]
    kf, kp = jax.random.split(key)

    def draw(k, mx):
        v = jax.random.uniform(k, (b,), minval=1.0, maxval=mx)
        inv = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.5, (b,))
        return jnp.where(inv, 1.0 / v, v)

    fs = draw(kf, cfg.formant_shift)
    ps = draw(kp, cfg.pitch_shift)
    out = jax.vmap(
        lambda w, f, p: gender_warp_j(w, f, p, max_pitch=cfg.pitch_shift)
    )(wavs, fs, ps)
    finite = jnp.all(jnp.isfinite(out), axis=1, keepdims=True)
    return jnp.where(finite, out.astype(wavs.dtype), wavs)

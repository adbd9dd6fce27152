"""Mel spectrograms matching the two conventions the reference uses.

1. VITS codec path (reference ttts/utils/data_utils.py:52-130): 32 kHz linear
   spectrogram with reflect pad (n_fft-hop)/2, center=False, sqrt(power+1e-6),
   then a librosa slaney-norm/slaney-scale mel matmul and log(clamp(x, 1e-5)).
2. Acoustic 24 kHz / 100-bin mel for GPT conditioning, diffusion targets and
   Vocos (reference ttts/vocoder/feature_extractors.py:28-49): torchaudio
   MelSpectrogram (center=True, power=1, htk scale, no norm) + safe_log
   (clip 1e-7, reference ttts/vocoder/modules.py:194).

Filterbanks are built in numpy at trace time (static constants folded by XLA);
the runtime path is frame→window→rFFT→|.|→mel matmul→log, which XLA fuses and
maps the matmul onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.ops.stft import stft, _reflect_pad_last


# ---------------------------------------------------------------------------
# Mel filterbank construction (host-side numpy, cached)
# ---------------------------------------------------------------------------


def _hz_to_mel(f, scale: str):
    f = np.asarray(f, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz(m, scale: str):
    m = np.asarray(m, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=32)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    scale: str = "slaney",
    norm: str | None = "slaney",
) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular mel filterbank.

    scale="slaney", norm="slaney" reproduces librosa.filters.mel defaults
    (codec path); scale="htk", norm=None reproduces torchaudio
    melscale_fbanks defaults (acoustic path).
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(fmin, scale), _hz_to_mel(fmax, scale), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, scale)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights = weights * enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# Log compressions
# ---------------------------------------------------------------------------


def dynamic_range_compression(x: jax.Array, clip_val: float = 1e-5, C: float = 1.0) -> jax.Array:
    """log(clamp(x, min=1e-5)) — reference ttts/utils/data_utils.py:21."""
    return jnp.log(jnp.maximum(x, clip_val) * C)


def safe_log(x: jax.Array, clip_val: float = 1e-7) -> jax.Array:
    """log(clip(x, min=1e-7)) — reference ttts/vocoder/modules.py:194."""
    return jnp.log(jnp.maximum(x, clip_val))


# ---------------------------------------------------------------------------
# VITS codec path (32 kHz)
# ---------------------------------------------------------------------------


def vits_spectrogram(y: jax.Array, n_fft: int, hop_length: int, win_length: int) -> jax.Array:
    """Linear magnitude spectrogram, reference spectrogram_torch semantics
    (ttts/utils/data_utils.py:52-87): reflect pad (n_fft-hop)/2 both sides,
    center=False, sqrt(re^2+im^2+1e-6).

    y: (B, T) → (B, n_fft//2+1, frames)
    """
    pad = int((n_fft - hop_length) / 2)
    y = _reflect_pad_last(y, pad)
    spec = stft(y, n_fft, hop_length, win_length, center=False)
    return jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-6)


def spec_to_mel(
    spec: jax.Array,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jax.Array:
    """librosa-slaney mel matmul + dynamic-range compression
    (reference ttts/utils/data_utils.py:90-103)."""
    basis = jnp.asarray(
        mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax, scale="slaney", norm="slaney")
    )
    mel = jnp.einsum("mf,...ft->...mt", basis, spec, precision="float32")
    return dynamic_range_compression(mel)


def vits_mel_spectrogram(
    y: jax.Array,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_length: int,
    win_length: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jax.Array:
    """mel_spectrogram_torch equivalent (ttts/utils/data_utils.py:106-155)."""
    spec = vits_spectrogram(y, n_fft, hop_length, win_length)
    return spec_to_mel(spec, n_fft, num_mels, sampling_rate, fmin, fmax)


# ---------------------------------------------------------------------------
# Tortoise-v1 22.05 kHz / 80-mel path (ttts/utils/utils.py TorchMelSpectrogram
# :387-425: torchaudio MelSpectrogram power=2, slaney norm, fmax 8000, then
# log(clamp(.,1e-5)) and optional per-bin mel_norms division)
# ---------------------------------------------------------------------------

TACOTRON_MEL_MAX = 5.5451774444795624753378569716654
TACOTRON_MEL_MIN = -16.118095650958319788125940182791


def tacotron_mel_spectrogram(
    audio: jax.Array,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    mel_norms: jax.Array | None = None,
) -> jax.Array:
    """(B, T) → (B, n_mels, frames), Tortoise-v1 conditioning mel."""
    spec = stft(audio, n_fft, hop_length, win_length, center=True)
    power = jnp.abs(spec) ** 2
    basis = jnp.asarray(
        mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax, scale="htk", norm="slaney")
    )
    mel = jnp.einsum("mf,...ft->...mt", basis, power, precision="float32")
    mel = jnp.log(jnp.maximum(mel, 1e-5))
    if mel_norms is not None:
        mel = mel / mel_norms[None, :, None]
    return mel


def normalize_tacotron_mel_minmax(mel: jax.Array) -> jax.Array:
    """Min-max [-1,1] normalization (diffusion_util.py:42-43 — the v1/unused
    convention; the v2 path uses scale-only ×0.18215, see
    models/diffusion_net.py normalize_tacotron_mel)."""
    return 2.0 * ((mel - TACOTRON_MEL_MIN) / (TACOTRON_MEL_MAX - TACOTRON_MEL_MIN)) - 1.0


def denormalize_tacotron_mel_minmax(norm_mel: jax.Array) -> jax.Array:
    return ((norm_mel + 1.0) / 2.0) * (TACOTRON_MEL_MAX - TACOTRON_MEL_MIN) + TACOTRON_MEL_MIN


# ---------------------------------------------------------------------------
# Acoustic 24 kHz / 100-mel path (torchaudio semantics)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "hop_length", "n_mels", "padding"),
)
def acoustic_mel_spectrogram(
    audio: jax.Array,
    sample_rate: int = 24000,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 100,
    padding: str = "center",
) -> jax.Array:
    """MelSpectrogramFeatures equivalent (ttts/vocoder/feature_extractors.py:28-49).

    torchaudio.transforms.MelSpectrogram(power=1, center=True, htk mel, no
    norm) followed by safe_log. audio: (B, T) → (B, n_mels, frames).
    """
    if padding == "same":
        pad = (n_fft - hop_length) // 2
        audio = _reflect_pad_last(audio, pad)
        center = False
        # torchaudio still center-pads inside MelSpectrogram when center=True;
        # the reference's "same" mode pre-pads then uses center=True as well.
        # reference sets center = (padding == "center") — so "same" => center=False.
    else:
        center = True
    spec = stft(audio, n_fft, hop_length, n_fft, center=center)
    mag = jnp.abs(spec)  # power=1
    basis = jnp.asarray(
        mel_filterbank(sample_rate, n_fft, n_mels, 0.0, sample_rate / 2.0, scale="htk", norm=None)
    )
    mel = jnp.einsum("mf,...ft->...mt", basis, mag, precision="float32")
    return safe_log(mel)

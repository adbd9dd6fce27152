"""MDCT / IMDCT (reference ttts/vocoder/spectral_ops.py:78-190).

FFT-based modified DCT with a cosine window and 50% overlap-add, used by the
Vocos IMDCT heads. Pure JAX; frame/overlap-add share the machinery in
ttts_tpu/ops/stft.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.ops.stft import frame, overlap_add


def _cosine_window(n: int) -> np.ndarray:
    return np.sin(np.pi / n * (np.arange(n) + 0.5)).astype(np.float32)


def mdct(audio: jax.Array, frame_len: int, padding: str = "same") -> jax.Array:
    """audio (B, T) → coefficients (B, L, N) with N = frame_len//2."""
    n = frame_len // 2
    n0 = (n + 1) / 2
    if padding == "center":
        pad = frame_len // 2
    elif padding == "same":
        pad = frame_len // 4
    else:
        raise ValueError("padding must be 'center' or 'same'")
    audio = jnp.pad(audio, ((0, 0), (pad, pad)))
    x = frame(audio, frame_len, frame_len // 2)  # (B, L, frame_len)
    window = jnp.asarray(_cosine_window(frame_len))
    x = x * window
    pre = jnp.exp(-1j * jnp.pi * jnp.arange(frame_len) / frame_len)
    post = jnp.exp(-1j * jnp.pi * n0 * (jnp.arange(n) + 0.5) / n)
    X = jnp.fft.fft(x * pre, axis=-1)[..., :n]
    return jnp.real(X * post) * math.sqrt(1 / n) * math.sqrt(2)


def imdct(X: jax.Array, frame_len: int, padding: str = "same") -> jax.Array:
    """coefficients (B, L, N) → audio (B, T)."""
    b, l, n = X.shape
    n0 = (n + 1) / 2
    Y = jnp.concatenate([X, -jnp.flip(X, axis=-1)], axis=-1).astype(jnp.complex64)
    pre = jnp.exp(1j * jnp.pi * n0 * jnp.arange(2 * n) / n)
    post = jnp.exp(1j * jnp.pi * (jnp.arange(2 * n) + n0) / (2 * n))
    y = jnp.fft.ifft(Y * pre, axis=-1)
    y = jnp.real(y * post) * math.sqrt(n) * math.sqrt(2)
    window = jnp.asarray(_cosine_window(frame_len))
    y = y * window
    # 50% overlap-add (dense shifted adds — see ops/stft.py overlap_add)
    out_len = (l + 1) * n
    audio = overlap_add(y, n)
    pad = frame_len // 2 if padding == "center" else frame_len // 4
    return audio[:, pad : out_len - pad]

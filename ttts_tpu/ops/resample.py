"""Polyphase windowed-sinc resampling (torchaudio.functional.resample semantics).

The reference resamples host audio with torchaudio's kaldi-style sinc
interpolation (hann window, lowpass_filter_width=6, rolloff=0.99) — e.g.
24 kHz conditioning audio in ttts/api_zh.py and 32 kHz clips in
ttts/vqvae/dataset.py:63. We build the same polyphase kernel bank in numpy
and apply it as one strided conv, which XLA maps onto the MXU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _sinc_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int]:
    """Polyphase kernel bank (new_freq, 2*width + orig_freq) and width."""
    base_freq = min(orig_freq, new_freq) / 2.0 * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * math.pi / lowpass_filter_width / 2.0) ** 2  # hann
    t = t * math.pi
    scale = base_freq / orig_freq
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * scale
    return kernel.astype(np.float32), width


def resample(
    x: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    """Resample (..., T) from orig_freq to new_freq."""
    if orig_freq == new_freq:
        return x
    g = math.gcd(int(orig_freq), int(new_freq))
    o, n = int(orig_freq) // g, int(new_freq) // g
    kernel_np, width = _sinc_kernel(o, n, lowpass_filter_width, rolloff)
    kernel = jnp.asarray(kernel_np)  # (n, 2w + o)

    lead_shape = x.shape[:-1]
    length = x.shape[-1]
    xb = x.reshape((-1, 1, length))
    xb = jnp.pad(xb, ((0, 0), (0, 0), (width, width + o)))
    # conv with stride o; each of the n output channels is one phase
    y = jax.lax.conv_general_dilated(
        xb,
        kernel[:, None, :],  # (out=n, in=1, kw)
        window_strides=(o,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, n, frames)
    y = jnp.swapaxes(y, 1, 2).reshape((xb.shape[0], -1))
    target_length = int(math.ceil(n * length / o))
    y = y[:, :target_length]
    return y.reshape(lead_shape + (target_length,))

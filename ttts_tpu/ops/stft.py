"""STFT / ISTFT primitives in pure JAX.

TPU notes: framing is expressed as a gather with static frame count so XLA can
fuse it; the FFT runs as a batched rFFT over (frames, n_fft), which XLA lowers
to its native FFT. All shapes are static.

Semantics match the reference conventions:
  - ``stft``: torch.stft with center=False (caller pads) or center=True,
    onesided, not normalized (reference ttts/utils/data_utils.py:52-87).
  - ``istft``: the Vocos custom overlap-add ISTFT with "same" padding
    (reference ttts/vocoder/spectral_ops.py:7-76).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window — matches torch.hann_window(periodic=True)."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def frame(x: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """Slice ``x`` (..., T) into overlapping frames (..., n_frames, frame_length).

    n_frames = 1 + (T - frame_length) // hop_length (torch center=False count).
    """
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop_length
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    )  # static gather indices
    return x[..., idx]


def _reflect_pad_last(x: jax.Array, pad: int) -> jax.Array:
    if pad == 0:
        return x
    cfg = [(0, 0, 0)] * (x.ndim - 1) + [(pad, pad, 0)]
    # jnp.pad reflect matches torch reflect padding
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


@functools.lru_cache(maxsize=8)
def _windowed_dft_filters(n_fft: int, win_length: int) -> np.ndarray:
    """(2·(n_fft//2+1), 1, n_fft) conv filters computing a windowed rDFT:
    rows [0, F) are window·cos(2πkn/N), rows [F, 2F) are −window·sin —
    so conv output channels stack [real; imag] of torch-convention rfft."""
    m = np.arange(win_length)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * m / win_length)  # periodic hann, f64
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = np.pad(win, (lpad, n_fft - win_length - lpad))
    n = np.arange(n_fft)
    k = np.arange(n_fft // 2 + 1)
    ang = 2.0 * np.pi * k[:, None] * n[None, :] / n_fft
    basis = np.concatenate([np.cos(ang) * win, -np.sin(ang) * win], axis=0)
    return basis.astype(np.float32)[:, None, :]


def _stft_conv(y: jax.Array, n_fft: int, hop_length: int,
               win_length: int) -> jax.Array:
    """STFT as ONE strided MXU convolution against a windowed-DFT basis.

    The fft-impl path (gather-framing + jnp.fft.rfft) does not map well onto
    the TPU: the (n_frames, n_fft) gather serializes and XLA's TPU FFT is
    slow for these sizes — measured 42.6 ms for the GAN step's four
    spectrograms (`scripts/bench_gan_dsp.py --component specmel`) where the
    DFT matmul is ~1e11 flops ≈ 1 ms of MXU. f32-pinned: these feed ≤1e-3
    parity contracts (CLAUDE.md)."""
    filt = jnp.asarray(_windowed_dft_filters(n_fft, win_length))
    batch_shape = y.shape[:-1]
    x = y.reshape((-1, 1, y.shape[-1])).astype(jnp.float32)
    out = jax.lax.conv_general_dilated(
        x, filt, window_strides=(hop_length,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, 2F, n_frames)
    f = n_fft // 2 + 1
    spec = jax.lax.complex(out[:, :f], out[:, f:])
    return spec.reshape(batch_shape + spec.shape[1:])


def stft(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: jax.Array | None = None,
    center: bool = False,
    pad_mode: str = "reflect",
    impl: str = "auto",
) -> jax.Array:
    """Complex STFT of ``y`` (..., T) → (..., n_fft//2+1, n_frames).

    Matches torch.stft(onesided=True, normalized=False, return_complex=True).
    impl: "auto"(="fft") = gather-framing + jnp.fft.rfft; "conv" = windowed-
    DFT strided convolution (kept as an option with pinned parity,
    test_dsp). MEASURED on v5e (16×8 s batch, amortized): fft wins —
    10.1 vs 33.5 ms at n_fft 2048/hop 640, 13.1 vs 23.4 ms at 1024/256;
    the f32-pinned strided large-kernel conv lowers to a poor implicit
    GEMM, so the MXU formulation loses to XLA's FFT here.
    """
    win_length = win_length or n_fft
    if impl == "auto":
        impl = "fft"
    if impl == "conv" and window is None:
        if center:
            assert pad_mode == "reflect"
            y = _reflect_pad_last(y, n_fft // 2)
        return _stft_conv(y, n_fft, hop_length, win_length)
    if window is None:
        window = hann_window(win_length, dtype=y.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        assert pad_mode == "reflect"
        y = _reflect_pad_last(y, n_fft // 2)
    frames = frame(y, n_fft, hop_length)  # (..., n_frames, n_fft)
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (..., n_frames, n_fft//2+1)
    return jnp.swapaxes(spec, -1, -2)


def overlap_add(frames: jax.Array, hop_length: int) -> jax.Array:
    """Overlap-add frames (B, T, W) → (B, (T-1)*hop + W).

    When W is a multiple of hop (every in-tree user: Vocos ISTFT W=4·hop,
    MDCT W=2·hop), each output sample receives exactly W//hop frame
    contributions, so the OLA is W//hop shifted DENSE adds over a
    (B, T+m-1, hop) buffer. The previous formulation — one scatter-add with
    T·W indices — serializes on the TPU scatter unit and dominated the whole
    Vocos decode (config 4b); the dense form is a handful of fused
    vector adds."""
    b, t, w = frames.shape
    if w % hop_length == 0:
        m = w // hop_length
        fr = frames.reshape(b, t, m, hop_length)
        out = jnp.zeros((b, t + m - 1, hop_length), frames.dtype)
        for j in range(m):
            out = out.at[:, j : j + t].add(fr[:, :, j])
        return out.reshape(b, -1)
    idx = (
        np.arange(t)[:, None] * hop_length + np.arange(w)[None, :]
    ).reshape(-1)
    out_len = (t - 1) * hop_length + w
    return jnp.zeros((b, out_len), frames.dtype).at[:, idx].add(
        frames.reshape(b, -1))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "padding"))
def istft(
    spec: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    padding: str = "same",
) -> jax.Array:
    """Inverse STFT with overlap-add.

    ``spec``: complex (B, n_fft//2+1, T). Returns (B, L).
    padding="same": trims (win - hop)//2 from both ends (Vocos convention,
    reference ttts/vocoder/spectral_ops.py:40-76); "center" trims n_fft//2.
    """
    window = hann_window(win_length, dtype=jnp.float32)
    b, _, t = spec.shape
    ifft = jnp.fft.irfft(spec, n=n_fft, axis=1)  # (B, n_fft, T), norm="backward"
    ifft = ifft * window[None, :, None]

    output_size = (t - 1) * hop_length + win_length
    y = overlap_add(jnp.swapaxes(ifft, 1, 2), hop_length)

    # the window-square envelope depends only on static shapes — build it on
    # host at trace time instead of a device scatter
    n = np.arange(win_length)
    win_sq_np = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)) ** 2
    env_np = np.zeros((output_size,), np.float64)
    for j in range(t):
        env_np[j * hop_length : j * hop_length + win_length] += win_sq_np
    env = jnp.asarray(env_np, jnp.float32)

    if padding == "same":
        pad = (win_length - hop_length) // 2
    elif padding == "center":
        pad = n_fft // 2
    else:
        raise ValueError("padding must be 'same' or 'center'")
    y = y[:, pad : output_size - pad]
    env = env[pad : output_size - pad]
    return y / jnp.maximum(env, 1e-11)

"""Audio IO: native C++ fast path (ttts_tpu/native/libttts_audio.so via
ctypes) with a pure-Python stdlib fallback.

Covers the host-side duties the reference delegated to torchaudio/pydub
(SURVEY §2.9): WAV decode → mono float32, polyphase sinc resampling
(torchaudio semantics), PCM16 writing, and energy-VAD silence splitting
(ttts/prepare/vad_process.py:6-31: min_silence 500 ms, −40 dB).
"""

from __future__ import annotations

import ctypes
import pathlib
import wave
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = pathlib.Path(__file__).resolve().parent.parent / "native" / "libttts_audio.so"
_lib = None


def _native():
    global _lib
    if _lib is None and not _LIB_PATH.exists():
        # build on first use (binary is not checked in)
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", str(_LIB_PATH.parent)], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if _lib is None and _LIB_PATH.exists():
        lib = ctypes.CDLL(str(_LIB_PATH))

        class WavInfo(ctypes.Structure):
            _fields_ = [
                ("sample_rate", ctypes.c_int32),
                ("channels", ctypes.c_int32),
                ("frames", ctypes.c_int64),
            ]

        lib.WavInfo = WavInfo
        lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(WavInfo)]
        lib.wav_decode_mono.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.wav_write_pcm16.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        lib.resample_out_len.argtypes = [ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
        lib.resample_out_len.restype = ctypes.c_int64
        lib.resample_sinc.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.vad_split.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
        ]
        _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_wav(path: str | pathlib.Path, target_sr: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """WAV → (mono float32 [-1,1], sample_rate), optional resample."""
    path = str(path)
    lib = _native()
    if lib is not None:
        info = lib.WavInfo()
        rc = lib.wav_info(path.encode(), ctypes.byref(info))
        if rc == 0:
            out = np.empty(info.frames, np.float32)
            rc = lib.wav_decode_mono(path.encode(), _fptr(out))
            if rc == 0:
                sr = info.sample_rate
                if target_sr and sr != target_sr:
                    out, sr = resample_audio(out, sr, target_sr), target_sr
                return out, sr
    # stdlib fallback (PCM16/PCM32 only)
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(n)
    if sw == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif sw == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    data = data.reshape(-1, ch).mean(axis=1)
    if target_sr and sr != target_sr:
        data, sr = resample_audio(data, sr, target_sr), target_sr
    return data, sr


def wav_frames(path: str | pathlib.Path, target_sr: Optional[int] = None) -> int:
    """Frame count from the WAV HEADER alone — O(1) per file, no decode.

    Used by the bucket sampler's length scan (train_vqvae): the reference
    decodes every file up front (vqvae/dataset.py); here the native wav_info
    reads 44-ish bytes. With target_sr the count is rescaled to the training
    sample rate so bucket boundaries (in target-sr samples) stay correct."""
    path = str(path)
    lib = _native()
    if lib is not None:
        info = lib.WavInfo()
        if lib.wav_info(path.encode(), ctypes.byref(info)) == 0:
            n, sr = int(info.frames), int(info.sample_rate)
            return n if not target_sr else int(n * target_sr / sr)
    with wave.open(path, "rb") as w:
        n, sr = w.getnframes(), w.getframerate()
    return n if not target_sr else int(n * target_sr / sr)


def resample_audio(x: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase sinc resample on host (native; numpy fallback mirrors
    ttts_tpu/ops/resample.py)."""
    if orig_sr == new_sr:
        return x
    lib = _native()
    x = np.ascontiguousarray(x, np.float32)
    if lib is not None:
        out_len = lib.resample_out_len(len(x), orig_sr, new_sr)
        out = np.empty(out_len, np.float32)
        rc = lib.resample_sinc(_fptr(x), len(x), orig_sr, new_sr, _fptr(out))
        if rc == 0:
            return out
    import jax.numpy as jnp

    from ttts_tpu.ops.resample import resample as jresample

    return np.asarray(jresample(jnp.asarray(x[None]), orig_sr, new_sr))[0]


def save_wav(path: str | pathlib.Path, data: np.ndarray, sample_rate: int):
    data = np.ascontiguousarray(np.clip(data, -1, 1), np.float32)
    lib = _native()
    if lib is not None:
        rc = lib.wav_write_pcm16(str(path).encode(), _fptr(data), len(data), sample_rate)
        if rc == 0:
            return
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes((data * 32767).astype(np.int16).tobytes())


def vad_split(
    x: np.ndarray,
    sample_rate: int,
    min_silence_ms: int = 500,
    silence_thresh_db: float = -40.0,
    keep_silence_ms: int = 100,
    max_segments: int = 4096,
) -> List[Tuple[int, int]]:
    """Energy-based silence splitting (vad_process.py semantics)."""
    lib = _native()
    x = np.ascontiguousarray(x, np.float32)
    if lib is not None:
        starts = np.zeros(max_segments, np.int64)
        ends = np.zeros(max_segments, np.int64)
        n = lib.vad_split(
            _fptr(x), len(x), sample_rate, min_silence_ms,
            ctypes.c_float(silence_thresh_db), keep_silence_ms,
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            max_segments,
        )
        return [(int(starts[i]), int(ends[i])) for i in range(n)]
    # numpy fallback: 10 ms energy windows
    win = sample_rate // 100
    n_win = len(x) // win
    e = (x[: n_win * win].reshape(n_win, win) ** 2).mean(axis=1)
    silent = e < 10 ** (silence_thresh_db / 10)
    segs = []
    start, sil = None, 0
    min_sil = max(1, min_silence_ms // 10)
    keep = keep_silence_ms * sample_rate // 1000
    for w in range(n_win + 1):
        is_sil = True if w == n_win else bool(silent[w])
        if not is_sil:
            if start is None:
                start = w * win
            sil = 0
        else:
            sil += 1
            if start is not None and (sil >= min_sil or w == n_win):
                end = (w - sil + 1) * win
                segs.append((max(0, start - keep), min(len(x), end + keep)))
                start = None
    return segs

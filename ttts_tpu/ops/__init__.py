"""Pure-JAX (+Pallas) DSP and compute primitives."""

from ttts_tpu.ops.stft import frame, hann_window, stft, istft  # noqa: F401
from ttts_tpu.ops.mel import (  # noqa: F401
    mel_filterbank,
    vits_spectrogram,
    spec_to_mel,
    vits_mel_spectrogram,
    acoustic_mel_spectrogram,
    safe_log,
    dynamic_range_compression,
)
from ttts_tpu.ops.resample import resample  # noqa: F401

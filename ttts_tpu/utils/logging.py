"""Metrics / logging / observability.

TensorBoard-compatible event writing (reference `summarize`,
ttts/utils/utils.py:32-41 and vc_utils.py:313-323), spectrogram image
rendering (plot_spectrogram_to_numpy, utils/utils.py:42), a file+console
logger (vc_utils.get_logger:468), and a jax.profiler trace hook (the
reference's commented torch.autograd.profiler scaffolding,
gpt/train.py:3,98,122 — here it's real)."""

from __future__ import annotations

import contextlib
import logging
import pathlib
import sys
from typing import Dict, Optional

import numpy as np


class SummaryWriter:
    """Thin wrapper over tensorboardX with the reference's `summarize` API."""

    def __init__(self, logdir: str | pathlib.Path):
        from tensorboardX import SummaryWriter as TBWriter

        pathlib.Path(logdir).mkdir(parents=True, exist_ok=True)
        self._w = TBWriter(str(logdir))

    def summarize(
        self,
        global_step: int,
        scalars: Optional[Dict[str, float]] = None,
        histograms: Optional[Dict] = None,
        images: Optional[Dict[str, np.ndarray]] = None,
        audios: Optional[Dict[str, np.ndarray]] = None,
        audio_sampling_rate: int = 24000,
    ):
        for k, v in (scalars or {}).items():
            self._w.add_scalar(k, float(v), global_step)
        for k, v in (histograms or {}).items():
            self._w.add_histogram(k, np.asarray(v), global_step)
        for k, v in (images or {}).items():
            self._w.add_image(k, v, global_step, dataformats="HWC")
        for k, v in (audios or {}).items():
            self._w.add_audio(k, np.asarray(v), global_step, audio_sampling_rate)

    def close(self):
        self._w.close()


def plot_spectrogram_to_numpy(spectrogram: np.ndarray) -> np.ndarray:
    """(C, T) or (T, C) spectrogram → HWC uint8 image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    spec = np.asarray(spectrogram)
    if spec.shape[0] > spec.shape[1]:
        spec = spec.T
    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(spec, aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


def get_logger(name: str = "ttts_tpu", log_file: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        logger.setLevel(logging.INFO)
        fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_file:
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

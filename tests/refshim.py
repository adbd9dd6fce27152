"""Import the PyTorch reference (/root/reference) for cross-implementation
parity tests.

The reference only fails to import here because librosa/torchaudio are absent
from the image; the model classes we compare against barely touch them
(librosa is used for mel filterbanks + dataset IO, torchaudio only inside
dataset/TorchMelSpectrogram paths we don't instantiate). This installs
minimal fakes in sys.modules — mel filters delegate to our own
slaney-compatible implementation (ttts_tpu/ops/mel.py) so the reference DSP
still computes real numbers — then puts /root/reference on sys.path.

Usage in tests:
    ref = pytest.importorskip("refshim").load()   # or: import refshim
    vq2 = refshim.import_ref("ttts.vqvae.vq2")
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np

_REFERENCE_PATH = "/root/reference"


def _fake_librosa():
    import ttts_tpu.ops.mel as our_mel

    librosa = types.ModuleType("librosa")
    util = types.ModuleType("librosa.util")
    filters = types.ModuleType("librosa.filters")

    def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False,
            norm="slaney", dtype=np.float32):
        fb = our_mel.mel_filterbank(
            sr, n_fft, n_mels, fmin, fmax,
            scale="htk" if htk else "slaney", norm=norm,
        )
        # librosa returns (n_mels, 1 + n_fft/2)
        return np.asarray(fb, dtype=dtype).T

    def normalize(S, *a, **k):  # librosa.util.normalize (peak norm, axis=0)
        S = np.asarray(S)
        m = np.max(np.abs(S), axis=k.get("axis", 0), keepdims=True)
        return S / np.maximum(m, 1e-10)

    def pad_center(data, *, size, axis=-1, **kwargs):
        data = np.asarray(data)
        n = data.shape[axis]
        lpad = (size - n) // 2
        widths = [(0, 0)] * data.ndim
        widths[axis] = (lpad, size - n - lpad)
        return np.pad(data, widths, mode=kwargs.get("mode", "constant"))

    def tiny(x):
        return np.finfo(np.asarray(x).dtype if hasattr(x, "dtype") else np.float32).tiny

    filters.mel = mel
    util.normalize = normalize
    util.pad_center = pad_center
    util.tiny = tiny
    librosa.util = util
    librosa.filters = filters
    librosa.__version__ = "0.0-shim"
    return {"librosa": librosa, "librosa.util": util, "librosa.filters": filters}


def _fake_rotary():
    # ttts/utils/transformer.py imports rotary_embedding_torch at module level
    # but the CLVP path uses xtransformers' own RotaryEmbedding; a stub that
    # raises on instantiation is enough for imports
    mod = types.ModuleType("rotary_embedding_torch")

    class RotaryEmbedding:
        def __init__(self, *a, **k):
            raise RuntimeError("rotary_embedding_torch shim: not available")

    def broadcat(*a, **k):
        raise RuntimeError("rotary_embedding_torch shim: not available")

    mod.RotaryEmbedding = RotaryEmbedding
    mod.broadcat = broadcat
    mod.apply_rotary_emb = broadcat
    return {"rotary_embedding_torch": mod}


def _fake_torchaudio():
    import math

    torchaudio = types.ModuleType("torchaudio")
    transforms = types.ModuleType("torchaudio.transforms")
    functional = types.ModuleType("torchaudio.functional")
    functional_inner = types.ModuleType("torchaudio.functional.functional")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("torchaudio shim: not available in this image")

    # real mel-scale helpers (torchaudio.functional.functional semantics) —
    # ttts/vocoder/heads.py:3 imports them at module level; IMDCTSymExpHead
    # uses them for its perceptual init when sample_rate is given
    def _hz_to_mel(freq: float, mel_scale: str = "htk") -> float:
        if mel_scale == "htk":
            return 2595.0 * math.log10(1.0 + freq / 700.0)
        mels = (freq - 0.0) / (200.0 / 3)
        min_log_hz, min_log_mel = 1000.0, 1000.0 / (200.0 / 3)
        logstep = math.log(6.4) / 27.0
        if freq >= min_log_hz:
            mels = min_log_mel + math.log(freq / min_log_hz) / logstep
        return mels

    def _mel_to_hz(mels, mel_scale: str = "htk"):
        import torch

        if mel_scale == "htk":
            return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
        freqs = 0.0 + (200.0 / 3) * mels
        min_log_hz, min_log_mel = 1000.0, 1000.0 / (200.0 / 3)
        logstep = math.log(6.4) / 27.0
        log_t = mels >= min_log_mel
        freqs[log_t] = min_log_hz * torch.exp(logstep * (mels[log_t] - min_log_mel))
        return freqs

    functional_inner._hz_to_mel = _hz_to_mel
    functional_inner._mel_to_hz = _mel_to_hz
    functional._hz_to_mel = _hz_to_mel
    functional._mel_to_hz = _mel_to_hz
    functional.functional = functional_inner
    transforms.MelSpectrogram = _Unavailable
    transforms.Resample = _Unavailable
    torchaudio.transforms = transforms
    torchaudio.functional = functional
    torchaudio.load = _Unavailable
    torchaudio.save = _Unavailable
    torchaudio.__version__ = "0.0-shim"
    return {
        "torchaudio": torchaudio,
        "torchaudio.transforms": transforms,
        "torchaudio.functional": functional,
        "torchaudio.functional.functional": functional_inner,
    }


_installed = False


def install():
    global _installed
    if _installed:
        return
    import importlib.machinery

    for name, mod in {**_fake_librosa(), **_fake_torchaudio(), **_fake_rotary()}.items():
        # a real ModuleSpec so importlib.util.find_spec() (e.g. transformers'
        # availability probes) doesn't choke on the fake
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules.setdefault(name, mod)
    # transformers 4.57 removed the LogitsWarper alias the reference imports
    # (ttts/utils/typical_sampling.py:2); LogitsProcessor is the same protocol
    import transformers

    if not hasattr(transformers, "LogitsWarper"):
        transformers.LogitsWarper = transformers.LogitsProcessor
    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    # import this NOW: later reference imports (ttts.gpt.model) can trigger a
    # transformers re-import that drops the LogitsWarper attribute above
    importlib.import_module("ttts.utils.typical_sampling")
    _installed = True


def import_ref(module: str):
    """Install shims and import a reference module (e.g. 'ttts.vqvae.vq2')."""
    install()
    return importlib.import_module(module)

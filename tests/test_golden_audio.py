"""Golden parity tests on the reference's checked-in sample audio
(tests/assets/0.wav = ttts/0.wav, 48 kHz mono). BASELINE config 1: the
single-utterance mel + VQ encode/decode roundtrip path."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ttts_tpu.config import VQVAEConfig
from ttts_tpu.data.audio import load_wav
from ttts_tpu.models.vqvae import SynthesizerTrn
from ttts_tpu.ops.mel import acoustic_mel_spectrogram, vits_spectrogram

ASSET = pathlib.Path(__file__).parent / "assets" / "0.wav"


@pytest.fixture(scope="module")
def wav32k():
    wav, sr = load_wav(ASSET, target_sr=32000)
    assert sr == 32000
    return wav[: (len(wav) // 640) * 640]


class TestRealAudioDSP:
    def test_vits_spec_matches_torch_on_real_audio(self, wav32k):
        """≤1e-3 parity on real speech (the BASELINE fidelity contract)."""
        y = wav32k[None].astype(np.float32)
        ours = np.asarray(vits_spectrogram(jnp.asarray(y), 2048, 640, 2048))
        yt = torch.from_numpy(y)
        pad = (2048 - 640) // 2
        yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
        spec = torch.stft(yt, 2048, hop_length=640, win_length=2048,
                          window=torch.hann_window(2048), center=False,
                          onesided=True, return_complex=True)
        golden = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-6).numpy()
        assert ours.shape == golden.shape
        assert np.abs(ours - golden).max() < 1e-3

    def test_acoustic_mel_sane_on_real_audio(self):
        wav, _ = load_wav(ASSET, target_sr=24000)
        mel = np.asarray(acoustic_mel_spectrogram(jnp.asarray(wav)[None]))
        assert mel.shape[1] == 100
        assert np.isfinite(mel).all()
        # speech energy: mel well above the log(1e-7) silence floor somewhere
        assert mel.max() > -10


TINY = VQVAEConfig(inter_channels=16, hidden_channels=16, filter_channels=32,
                   n_heads=2, n_layers=2, p_dropout=0.0,
                   upsample_initial_channel=32, gin_channels=16, codebook_bins=32,
                   posterior_wn_layers=2, flow_layers=1, flow_wn_layers=1)


@pytest.mark.slow
def test_codec_roundtrip_on_real_audio(wav32k):
    """wav → spec → extract_code → decode → wav (shapes + determinism)."""
    # keep it small for CI: first 2 seconds
    wav = wav32k[: 640 * 64]
    model = SynthesizerTrn(TINY, spec_channels=1025, segment_frames=8)
    w = jnp.asarray(wav)[None]
    spec = vits_spectrogram(w, 2048, 640, 2048).swapaxes(1, 2)
    sl = jnp.asarray([spec.shape[1]])
    text = jnp.zeros((1, 4), jnp.int32)
    tl = jnp.asarray([4])
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "slice": jax.random.key(2), "vq": jax.random.key(3)}
    variables = model.init(rngs, w[..., None], w[..., None], spec, spec, sl,
                           text, tl, train=False)

    codes1 = model.apply(variables, w[..., None], spec, sl, method=model.extract_code)
    codes2 = model.apply(variables, w[..., None], spec, sl, method=model.extract_code)
    np.testing.assert_array_equal(np.asarray(codes1), np.asarray(codes2))
    assert codes1.shape == (1, 1, spec.shape[1] // 2)

    out = model.apply(variables, jnp.transpose(codes1, (1, 0, 2)), text, spec,
                      method=model.decode, rngs={"noise": jax.random.key(5)})
    assert out.shape == (1, wav.shape[0], 1)
    assert np.isfinite(np.asarray(out)).all()

"""End-to-end serving pipeline smoke test (tiny configs, random weights).

This is the BASELINE config-5 integration path: BPE → GPT → CLVP rerank →
diffusion → vocoder on one utterance.
"""

import numpy as np
import pytest

from ttts_tpu.config import (
    AcousticMelConfig,
    AudioConfig,
    CLVPConfig,
    DiffusionNetConfig,
    DiffusionProcessConfig,
    GPTConfig,
    TTTSConfig,
    TrainConfig,
    VQVAEConfig,
    VocosConfig,
)
from ttts_tpu.api import TextToSpeech

TINY = TTTSConfig(
    audio=AudioConfig(sampling_rate=32000, filter_length=1024, hop_length=640,
                      win_length=1024, n_mel_channels=32),
    acoustic_mel=AcousticMelConfig(sample_rate=24000, n_fft=256, hop_length=256,
                                   n_mels=100),
    vqvae=VQVAEConfig(inter_channels=16, hidden_channels=16, filter_channels=32,
                      n_heads=2, n_layers=2, p_dropout=0.0,
                      upsample_initial_channel=32, gin_channels=16,
                      codebook_bins=32, posterior_wn_layers=2, flow_layers=1,
                      flow_wn_layers=1),
    gpt=GPTConfig(model_dim=64, layers=1, heads=2, max_text_tokens=64,
                  max_mel_tokens=128, number_mel_codes=1026,
                  start_mel_token=1024, stop_mel_token=1025),
    diffusion_net=DiffusionNetConfig(in_channels=100, out_channels=200,
                                     model_channels=64, num_heads=4, num_layers=1,
                                     in_latent_channels=64),
    clvp=CLVPConfig(dim_text=32, dim_speech=32, dim_latent=16,
                    num_text_tokens=256, num_speech_tokens=1026,
                    text_enc_depth=1, speech_enc_depth=1, text_heads=2,
                    speech_heads=2),
    vocos=VocosConfig(input_channels=100, dim=32, intermediate_dim=96,
                      num_layers=1, n_fft=1024, hop_length=256),
    train=TrainConfig(segment_size=640 * 4),
)


@pytest.mark.slow
def test_full_pipeline_smoke():
    tts = TextToSpeech(TINY, seed=0)
    rng = np.random.default_rng(0)
    voice = (rng.standard_normal(32000) * 0.1).astype(np.float32)  # 1 s @ 32 kHz
    wav = tts.tts(
        "ni3 hao3 shi4 jie4", voice, 32000, preset="ultra_fast",
        max_generate_length=32, voice_cache_key="v0",
    )
    assert wav.ndim == 1
    assert wav.shape[0] > 1000  # produced audio
    assert np.isfinite(wav).all()
    # conditioning cache hit path
    wav2 = tts.tts("ni3 hao3", voice, 32000, preset="ultra_fast",
                   max_generate_length=32, voice_cache_key="v0")
    assert np.isfinite(wav2).all()


@pytest.mark.slow
def test_fused_conditioning_matches_composed_stages():
    """get_conditioning is one fused jit program (api.py _conditioning_fn);
    it must equal the op-by-op composition of resample → extract_code →
    resample → acoustic mel it replaced."""
    import jax.numpy as jnp

    from ttts_tpu.ops.mel import acoustic_mel_spectrogram, vits_spectrogram
    from ttts_tpu.ops.resample import resample

    tts = TextToSpeech(TINY, seed=0, init_stages=("codec",))
    rng = np.random.default_rng(3)
    voice = (rng.standard_normal(44100) * 0.1).astype(np.float32)  # 1 s @ 44.1k

    codes, refer = tts.get_conditioning(voice, 44100)

    c = tts.cfg
    wav = jnp.asarray(voice, jnp.float32).reshape(1, -1)
    wav32 = resample(wav, 44100, c.audio.sampling_rate)
    hop = c.audio.hop_length
    wav32 = wav32[:, : (wav32.shape[1] // hop) * hop]
    spec = vits_spectrogram(wav32, c.audio.filter_length, hop,
                            c.audio.win_length).swapaxes(1, 2)
    want_codes = tts.codec.apply(
        tts.params["codec"], wav32[..., None], spec,
        jnp.asarray([spec.shape[1]]), method=tts.codec.extract_code,
    )[:, 0, :]
    wav24 = resample(wav, 44100, c.acoustic_mel.sample_rate)
    want_refer = acoustic_mel_spectrogram(
        wav24, c.acoustic_mel.sample_rate, c.acoustic_mel.n_fft,
        c.acoustic_mel.hop_length, c.acoustic_mel.n_mels,
    ).swapaxes(1, 2)

    np.testing.assert_array_equal(np.asarray(codes), np.asarray(want_codes))
    np.testing.assert_allclose(np.asarray(refer), np.asarray(want_refer),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_golden_e2e_snapshot():
    """Fixed-seed end-to-end regression pin: the TINY-config `tts()` output
    waveform must match the committed snapshot within a tolerance band, so
    silent numeric drift in ANY stage (DSP, codec, GPT+sampling, diffusion,
    vocoder) breaks a test instead of an audio demo.

    The snapshot also pins the prompt VQ codes (bit-exact ints) to localize
    a failure: codes mismatch → codec/DSP drift; codes equal but waveform
    length differs → GPT sampling flipped a token (logit drift upstream);
    same length but values drift → diffusion/vocoder numeric change.

    Regeneration (`TTTS_REGEN_GOLDEN=1 pytest tests/test_api.py -k golden`)
    is legitimate ONLY when an intentional, reviewed numerical change lands
    (e.g. a documented kernel rewrite with a new parity study) — never to
    silence an unexplained failure. CPU-only: f32 end to end, deterministic
    given the jax version; tolerances absorb cross-version XLA drift."""
    import os
    import pathlib

    asset = pathlib.Path(__file__).parent / "assets" / "golden_e2e_tiny.npz"
    tts = TextToSpeech(TINY, seed=0)
    rng = np.random.default_rng(0)
    voice = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    codes, _refer = tts.get_conditioning(voice, 32000)
    wav = tts.tts("ni3 hao3 shi4 jie4", voice, 32000, preset="ultra_fast",
                  max_generate_length=32, seed=0)
    if os.environ.get("TTTS_REGEN_GOLDEN") == "1":
        np.savez(asset, wav=wav, prompt_codes=np.asarray(codes))
        return
    ref = np.load(asset)
    np.testing.assert_array_equal(np.asarray(codes), ref["prompt_codes"],
                                  err_msg="prompt VQ codes drifted (codec/DSP)")
    assert wav.shape == ref["wav"].shape, (
        f"waveform length {wav.shape} != snapshot {ref['wav'].shape} — GPT "
        "sampling flipped a token (logit drift upstream of the tail)")
    np.testing.assert_allclose(
        wav, ref["wav"], atol=5e-4, rtol=0,
        err_msg="waveform drifted at equal code length (diffusion/vocoder)")

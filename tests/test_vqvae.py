"""Codec model tests (contract: ttts/vqvae/vq2.py SynthesizerTrn)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.config import VQVAEConfig
from ttts_tpu.models.vqvae import SynthesizerTrn, rand_slice_segments

TINY = VQVAEConfig(
    inter_channels=32,
    hidden_channels=32,
    filter_channels=64,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.0,
    upsample_initial_channel=64,
    gin_channels=32,
    codebook_bins=64,
    posterior_wn_layers=4,
    flow_layers=2,
    flow_wn_layers=2,
)

SPEC_CH = 129
HOP = 640
FRAMES = 16
B = 2


@pytest.fixture(scope="module")
def codec_and_inputs():
    rng = np.random.default_rng(0)
    model = SynthesizerTrn(TINY, spec_channels=SPEC_CH, segment_frames=8)
    wav = jnp.asarray(rng.standard_normal((B, FRAMES * HOP, 1)).astype(np.float32) * 0.1)
    spec = jnp.asarray(rng.standard_normal((B, FRAMES, SPEC_CH)).astype(np.float32))
    spec_lengths = jnp.asarray([FRAMES, FRAMES - 2])
    text = jnp.asarray(rng.integers(0, 50, size=(B, 12)))
    text_lengths = jnp.asarray([12, 9])
    rngs = {
        "params": jax.random.key(0),
        "noise": jax.random.key(1),
        "slice": jax.random.key(2),
        "vq": jax.random.key(3),
    }
    variables = model.init(
        rngs, wav, wav, spec, spec, spec_lengths, text, text_lengths, train=True
    )
    return model, variables, (wav, spec, spec_lengths, text, text_lengths), rngs


class TestSynthesizerTrn:
    def test_forward_shapes(self, codec_and_inputs):
        model, variables, (wav, spec, sl, text, tl), rngs = codec_and_inputs
        (o, commit, ids, y_mask, stats, quantized), mut = model.apply(
            variables, wav, wav, spec, spec, sl, text, tl, train=True,
            rngs=rngs, mutable=["codebook"],
        )
        assert o.shape == (B, 8 * HOP, 1)  # segment_frames * hop samples
        z, z_p, m_p, logs_p, m_q, logs_q = stats
        assert z.shape == (B, FRAMES, TINY.inter_channels)
        assert quantized.shape == (B, FRAMES, TINY.inter_channels)
        assert np.isfinite(np.asarray(o)).all()
        assert np.isfinite(float(commit))
        # codebook got k-means-initialized on first batch
        assert bool(mut["codebook"]["quantizer"]["state"].inited)

    def test_infer_reconstruction_path(self, codec_and_inputs):
        model, variables, (wav, spec, sl, text, tl), rngs = codec_and_inputs
        o = model.apply(
            variables, wav, spec, sl, text, tl, method=model.infer,
            rngs={"noise": jax.random.key(9)},
        )
        assert o.shape == (B, FRAMES * HOP, 1)
        assert np.isfinite(np.asarray(o)).all()

    def test_extract_code_and_decode(self, codec_and_inputs):
        model, variables, (wav, spec, sl, text, tl), rngs = codec_and_inputs
        codes = model.apply(variables, wav, spec, sl, method=model.extract_code)
        assert codes.shape == (B, TINY.n_q, FRAMES // 2)
        assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < TINY.codebook_bins).all()

        wav_out = model.apply(
            variables, jnp.transpose(codes, (1, 0, 2)), text, spec,
            method=model.decode, rngs={"noise": jax.random.key(5)},
        )
        assert wav_out.shape == (B, FRAMES * HOP, 1)
        assert np.isfinite(np.asarray(wav_out)).all()

    def test_extract_code_deterministic(self, codec_and_inputs):
        model, variables, (wav, spec, sl, text, tl), _ = codec_and_inputs
        c1 = model.apply(variables, wav, spec, sl, method=model.extract_code)
        c2 = model.apply(variables, wav, spec, sl, method=model.extract_code)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_rand_slice_segments():
    x = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    lengths = jnp.asarray([10, 6])
    sliced, ids = rand_slice_segments(jax.random.key(0), x, lengths, 4)
    assert sliced.shape == (2, 4, 3)
    assert (np.asarray(ids) >= 0).all()
    assert (np.asarray(ids) <= np.asarray(lengths) - 4).all()
    # slices are contiguous windows of the source
    for b in range(2):
        np.testing.assert_array_equal(
            np.asarray(sliced[b]), np.asarray(x[b, int(ids[b]) : int(ids[b]) + 4])
        )

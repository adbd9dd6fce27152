"""CLVP + classifier tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.config import CLVPConfig, ClassifierConfig
from ttts_tpu.models.classifier import AudioMiniEncoderWithClassifierHead
from ttts_tpu.models.clvp import CLVP, masked_mean

TINY_CLVP = CLVPConfig(
    dim_text=32, dim_speech=32, dim_latent=16, num_text_tokens=64,
    num_speech_tokens=64, text_enc_depth=2, speech_enc_depth=2,
    text_heads=4, speech_heads=4,
)


class TestCLVP:
    @pytest.fixture(scope="class")
    def clvp(self):
        rng = np.random.default_rng(11)
        model = CLVP(TINY_CLVP)
        text = jnp.asarray(rng.integers(0, 64, size=(3, 10)))
        speech = jnp.asarray(rng.integers(0, 64, size=(3, 20)))
        params = model.init(jax.random.key(0), text, speech)
        return model, params, text, speech

    def test_similarity_shape(self, clvp):
        model, params, text, speech = clvp
        sim = model.apply(params, text, speech)
        assert sim.shape == (3,)
        assert np.isfinite(np.asarray(sim)).all()

    def test_contrastive_loss(self, clvp):
        model, params, text, speech = clvp
        loss = model.apply(params, text, speech, return_loss=True)
        assert np.isfinite(float(loss))
        # untrained loss ≈ log(B)
        assert abs(float(loss) - np.log(3)) < 1.0

    def test_matched_pair_ranks_itself(self, clvp):
        model, params, text, speech = clvp
        # per-pair sim must equal the diagonal of the full sim matrix: check
        # permutation consistency — scoring (t0, s0) twice gives same value
        s1 = model.apply(params, text[:1], speech[:1])
        s2 = model.apply(params, text[:1], speech[:1])
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))

    def test_masked_mean(self):
        x = jnp.asarray([[[1.0], [3.0], [100.0]]])
        mask = jnp.asarray([[True, True, False]])
        np.testing.assert_allclose(np.asarray(masked_mean(x, mask)), [[2.0]])


class TestClassifier:
    def test_logits_and_loss(self, rng):
        cfg = ClassifierConfig(classes=2, spec_dim=16, embedding_dim=32, depth=2,
                               resnet_blocks=1, attn_blocks=2, num_attn_heads=4,
                               base_channels=8, distribute_zero_label=True)
        model = AudioMiniEncoderWithClassifierHead(cfg)
        mel = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32))
        params = model.init(jax.random.key(0), mel)
        logits = model.apply(params, mel)
        assert logits.shape == (2, 2)
        loss = model.apply(params, mel, labels=jnp.asarray([0, 1]))
        assert np.isfinite(float(loss))

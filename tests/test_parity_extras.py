"""Tests for the long-tail parity components: group quantizer,
MelStyleEncoderVAE, Vocos ResNet backbone + IMDCT heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.config import VocosConfig
from ttts_tpu.models.blocks import MelStyleEncoderVAE
from ttts_tpu.models.group_quantizer import GroupQuantizer
from ttts_tpu.models.vocos import IMDCTCosHead, IMDCTSymExpHead, VocosResNetBackbone


class TestGroupQuantizer:
    def test_roundtrip_and_loss(self, rng):
        q = GroupQuantizer(embed_dim=16, n_code_groups=4, n_codes=8)
        x = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32) * 0.05)
        params = q.init(jax.random.key(0), x)
        zq, loss, codes = q.apply(params, x)
        assert zq.shape == x.shape
        assert codes.shape == (2, 4, 6)
        assert float(loss) >= 0
        # embed(codes) reproduces the (non-straight-through) quantized values
        emb = q.apply(params, codes, method=q.embed)
        assert emb.shape == x.shape

    def test_gradient_flows_through_st(self, rng):
        q = GroupQuantizer(embed_dim=8, n_code_groups=2, n_codes=4)
        x = jnp.asarray(rng.standard_normal((1, 4, 8)).astype(np.float32))
        params = q.init(jax.random.key(0), x)

        def loss_fn(x):
            zq, loss, _ = q.apply(params, x)
            return jnp.sum(zq**2) + loss

        g = jax.grad(loss_fn)(x)
        assert np.abs(np.asarray(g)).max() > 0


class TestMelStyleEncoderVAE:
    def test_forward_and_kl(self, rng):
        m = MelStyleEncoderVAE(spec_channels=16, z_latent_dim=8, emb_dim=32)
        x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
        params = m.init({"params": jax.random.key(0), "noise": jax.random.key(1),
                         "dropout": jax.random.key(2)}, x, train=True)
        style, kl = m.apply(params, x, train=True,
                            rngs={"noise": jax.random.key(3),
                                  "dropout": jax.random.key(4)})
        assert style.shape == (2, 32)
        assert np.isfinite(float(kl))
        # eval mode deterministic
        s1, _ = m.apply(params, x)
        s2, _ = m.apply(params, x)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


class TestVocosVariants:
    CFG = VocosConfig(input_channels=8, dim=16, intermediate_dim=32, num_layers=1,
                      n_fft=64, hop_length=16)

    def test_resnet_backbone(self, rng):
        m = VocosResNetBackbone(self.CFG, num_blocks=2)
        mel = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
        params = m.init(jax.random.key(0), mel)
        out = m.apply(params, mel)
        assert out.shape == (2, 12, 16)

    @pytest.mark.parametrize("head_cls", [IMDCTSymExpHead, IMDCTCosHead])
    def test_imdct_heads(self, head_cls, rng):
        m = head_cls(mdct_frame_len=32, padding="same")
        x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
        params = m.init(jax.random.key(0), x)
        audio = m.apply(params, x)
        assert audio.shape[0] == 2
        assert np.isfinite(np.asarray(audio)).all()

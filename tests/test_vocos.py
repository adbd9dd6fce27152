"""Vocos vocoder tests (contract: ttts/vocoder/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ttts_tpu.config import VocosConfig
from ttts_tpu.models.vocos import ConvNeXtBlock, Vocos, port_torch_state_dict

TINY = VocosConfig(input_channels=16, dim=32, intermediate_dim=96, num_layers=2,
                   n_fft=64, hop_length=16, padding="center")


class TestVocos:
    def test_decode_shape(self, rng):
        mel = jnp.asarray(rng.standard_normal((2, 20, 16)).astype(np.float32))
        model = Vocos(TINY)
        params = model.init(jax.random.key(0), mel)
        wav = model.apply(params, mel)
        # center padding: output trimmed by n_fft//2 each side → (T-1)*hop...
        assert wav.shape[0] == 2
        assert abs(wav.shape[1] - 20 * TINY.hop_length) <= TINY.n_fft
        assert np.isfinite(np.asarray(wav)).all()

    def test_magnitude_clip(self, rng):
        # huge activations must not produce inf (heads.py:42 clip at 1e2)
        mel = jnp.asarray(rng.standard_normal((1, 8, 16)).astype(np.float32) * 100)
        model = Vocos(TINY)
        params = model.init(jax.random.key(0), mel)
        wav = model.apply(params, mel)
        assert np.isfinite(np.asarray(wav)).all()

    def test_convnext_block_matches_torch(self, rng):
        """Exact parity with the reference ConvNeXtBlock (modules.py:8-62)."""
        dim, inter = 8, 24
        x = rng.standard_normal((2, 10, dim)).astype(np.float32)
        m = ConvNeXtBlock(dim, inter, 0.125)
        params = m.init(jax.random.key(1), jnp.asarray(x))

        tb = torch.nn.ModuleDict()
        tb["dwconv"] = torch.nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        tb["norm"] = torch.nn.LayerNorm(dim, eps=1e-6)
        tb["pw1"] = torch.nn.Linear(dim, inter)
        tb["pw2"] = torch.nn.Linear(inter, dim)
        p = params["params"]
        tb["dwconv"].weight.data = torch.from_numpy(
            np.transpose(np.asarray(p["Conv_0"]["kernel"]), (2, 1, 0)).copy()
        )
        tb["dwconv"].bias.data = torch.from_numpy(np.asarray(p["Conv_0"]["bias"]).copy())
        tb["norm"].weight.data = torch.from_numpy(np.asarray(p["LayerNorm_0"]["scale"]).copy())
        tb["norm"].bias.data = torch.from_numpy(np.asarray(p["LayerNorm_0"]["bias"]).copy())
        tb["pw1"].weight.data = torch.from_numpy(np.asarray(p["Dense_0"]["kernel"]).T.copy())
        tb["pw1"].bias.data = torch.from_numpy(np.asarray(p["Dense_0"]["bias"]).copy())
        tb["pw2"].weight.data = torch.from_numpy(np.asarray(p["Dense_1"]["kernel"]).T.copy())
        tb["pw2"].bias.data = torch.from_numpy(np.asarray(p["Dense_1"]["bias"]).copy())
        gamma = torch.from_numpy(np.asarray(p["gamma"]).copy())

        xt = torch.from_numpy(x.transpose(0, 2, 1))
        h = tb["dwconv"](xt).transpose(1, 2)
        h = tb["norm"](h)
        h = tb["pw2"](torch.nn.functional.gelu(tb["pw1"](h)))
        expected = (xt.transpose(1, 2) + gamma * h).detach().numpy()

        ours = np.asarray(m.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours, expected, atol=1e-5)


class TestVocosFullModelPort:
    """Full-model round-trip through the RELEASED `charactr/vocos-mel-24khz`
    architecture (ttts/vocoder/config.yaml: dim 512, intermediate 1536,
    8 ConvNeXt blocks, n_fft 1024, hop 256, padding center): instantiate the
    reference's own VocosBackbone + ISTFTHead (ttts/vocoder/{models,heads}.py)
    at that config, port the complete state dict with
    `models/vocos.py port_torch_state_dict`, and assert mel→wav ≤1e-3.

    This is the porter the real released checkpoint would go through — the
    image has no network, so random-init reference weights stand in; every
    key and every transpose is the same."""

    CFG = VocosConfig(input_channels=100, dim=512, intermediate_dim=1536,
                      num_layers=8, n_fft=1024, hop_length=256,
                      padding="center")

    @pytest.fixture(scope="class")
    def bundle(self):
        import refshim

        models = refshim.import_ref("ttts.vocoder.models")
        heads = refshim.import_ref("ttts.vocoder.heads")
        torch.manual_seed(7)
        backbone = models.VocosBackbone(
            input_channels=100, dim=512, intermediate_dim=1536, num_layers=8
        ).eval()
        head = heads.ISTFTHead(dim=512, n_fft=1024, hop_length=256,
                               padding="center").eval()
        sd = {f"backbone.{k}": v.detach().numpy()
              for k, v in backbone.state_dict().items()}
        sd.update({f"head.{k}": v.detach().numpy()
                   for k, v in head.state_dict().items()})
        return backbone, head, sd

    def test_full_decode_parity(self, bundle):
        backbone, head, sd = bundle
        rng = np.random.default_rng(21)
        t_frames = 37
        mel = rng.standard_normal((2, t_frames, 100)).astype(np.float32)

        model = Vocos(self.CFG)
        params = jax.eval_shape(
            lambda: model.init(jax.random.key(0),
                               jnp.zeros((1, 4, 100), jnp.float32))
        )
        params = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), params)
        params = port_torch_state_dict(params, sd)
        wav_j = np.asarray(jax.jit(model.apply)(params, jnp.asarray(mel)))

        with torch.no_grad():
            h = backbone(torch.from_numpy(mel.transpose(0, 2, 1)))
            wav_t = head(h).numpy()

        assert wav_j.shape == wav_t.shape
        np.testing.assert_allclose(wav_j, wav_t, atol=1e-3, rtol=0)
        # the released checkpoint is ~exp-scaled; pin a tighter bound too so
        # drift is visible before it reaches the contract edge
        assert np.max(np.abs(wav_j - wav_t)) < 1e-4

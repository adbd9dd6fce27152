"""Vocos vocoder tests (contract: ttts/vocoder/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ttts_tpu.config import VocosConfig
from ttts_tpu.models.vocos import ConvNeXtBlock, Vocos

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

"""Building-block parity tests vs torch (CPU) with copied weights."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from ttts_tpu.models.blocks import (
    AntiAliasedActivation,
    Conv1d,
    ConvTranspose1d,
    _abs_to_rel,
    _rel_to_abs,
    sequence_mask,
)


class TestConv:
    def test_conv1d_matches_torch(self, rng):
        x = rng.standard_normal((2, 50, 8)).astype(np.float32)
        m = Conv1d(16, 5, dilation=2)
        params = m.init(jax.random.key(0), jnp.asarray(x))
        tconv = torch.nn.Conv1d(8, 16, 5, dilation=2, padding=4)
        k = np.asarray(params["params"]["Conv_0"]["kernel"])  # (k, in, out)
        tconv.weight.data = torch.from_numpy(k.transpose(2, 1, 0).copy())
        tconv.bias.data = torch.from_numpy(np.asarray(params["params"]["Conv_0"]["bias"]))
        ours = np.asarray(m.apply(params, jnp.asarray(x)))
        theirs = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_conv1d_strided_length(self, rng):
        # posterior downsample stack geometry: stride u kernel k pad (k-1)//2
        for t, k, u in [(640, 16, 10), (64, 16, 8), (8, 8, 2), (4, 2, 2)]:
            x = jnp.zeros((1, t, 4))
            m = Conv1d(4, k, stride=u, padding=((k - 1) // 2, (k - 1) // 2))
            y = m.apply(m.init(jax.random.key(0), x), x)
            expected = (t + 2 * ((k - 1) // 2) - k) // u + 1
            assert y.shape[1] == expected

    def test_conv_transpose_matches_torch(self, rng):
        x = rng.standard_normal((2, 30, 8)).astype(np.float32)
        k, u = 16, 10
        m = ConvTranspose1d(4, k, u, torch_padding=(k - u) // 2)
        params = m.init(jax.random.key(0), jnp.asarray(x))
        tconv = torch.nn.ConvTranspose1d(8, 4, k, u, padding=(k - u) // 2)
        kk = np.asarray(params["params"]["kernel"])  # (k, in, out)
        tconv.weight.data = torch.from_numpy(kk.transpose(1, 2, 0).copy())
        tconv.bias.data = torch.from_numpy(np.asarray(params["params"]["bias"]))
        ours = np.asarray(m.apply(params, jnp.asarray(x)))
        theirs = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
        assert ours.shape == theirs.shape  # (2, 300, 4)
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


class TestRelPos:
    def test_rel_abs_inverse_consistency(self, rng):
        # scores at (i, j) must come from relative index (j - i + l - 1)
        l = 6
        x = rng.standard_normal((1, 1, l, 2 * l - 1)).astype(np.float32)
        abs_ = np.asarray(_rel_to_abs(jnp.asarray(x)))
        for i in range(l):
            for j in range(l):
                np.testing.assert_allclose(abs_[0, 0, i, j], x[0, 0, i, j - i + l - 1])

    def test_abs_to_rel_roundtrip(self, rng):
        l = 5
        p = rng.standard_normal((2, 3, l, l)).astype(np.float32)
        rel = np.asarray(_abs_to_rel(jnp.asarray(p)))
        for i in range(l):
            for j in range(l):
                np.testing.assert_allclose(rel[..., i, j - i + l - 1], p[..., i, j])


class TestMisc:
    def test_sequence_mask(self):
        m = np.asarray(sequence_mask(jnp.asarray([2, 4]), 5))
        assert m.shape == (2, 5, 1)
        np.testing.assert_array_equal(m[0, :, 0], [1, 1, 0, 0, 0])

    def test_antialiased_activation_shape(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 40, 8)).astype(np.float32))
        m = AntiAliasedActivation(8)
        y = m.apply(m.init(jax.random.key(0), x), x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

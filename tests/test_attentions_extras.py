"""Cross-parity for the attentions.py stragglers (FFT,
TransformerCouplingLayer, depthwise-separable convs) against the reference's
own torch classes (/root/reference/ttts/vqvae/attentions.py:439-708).

These classes are dead in the reference's live import graph (PARITY.md
§2.13) but are rebuilt in models/attentions_extras.py for surface
completeness; parity here is the ≤1e-3 contract used across the suite.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import refshim

TOL = 1e-3


@pytest.fixture(scope="module")
def ref_attn():
    return refshim.import_ref("ttts.vqvae.attentions")


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestDepthwiseSeparableConvs:
    def test_conv1d_parity_with_weight_norm(self, ref_attn):
        from ttts_tpu.models.attentions_extras import DepthwiseSeparableConv1d
        from ttts_tpu.models.porting import port_depthwise_separable_conv_state

        torch.manual_seed(0)
        ref = ref_attn.Depthwise_Separable_Conv1D(16, 24, 5, padding=2)
        ref.weight_norm()
        ref.eval()

        ours = DepthwiseSeparableConv1d(24, 5, padding=2, weight_norm=True)
        params = jax.tree_util.tree_map(
            jnp.asarray, port_depthwise_separable_conv_state(_np_sd(ref)))

        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 16, 40)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        got = ours.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1), want, atol=TOL, rtol=0)

    def test_transpose_conv1d_parity(self, ref_attn):
        from ttts_tpu.models.attentions_extras import (
            DepthwiseSeparableConvTranspose1d)
        from ttts_tpu.models.porting import port_depthwise_separable_conv_state

        torch.manual_seed(0)
        ref = ref_attn.Depthwise_Separable_TransposeConv1D(
            12, 20, 4, stride=2, padding=1)
        ref.eval()

        ours = DepthwiseSeparableConvTranspose1d(20, 4, stride=2, padding=1)
        params = jax.tree_util.tree_map(
            jnp.asarray,
            port_depthwise_separable_conv_state(_np_sd(ref), transpose=True))

        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 12, 25)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        got = ours.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 1)))
        assert got.shape == (2, want.shape[2], 20)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1), want, atol=TOL, rtol=0)


class TestFFT:
    B, T, H = 2, 24, 64

    @pytest.mark.parametrize("isflow", [False, True])
    def test_parity(self, ref_attn, isflow):
        from ttts_tpu.models.attentions_extras import FFT
        from ttts_tpu.models.porting import port_fft_state

        torch.manual_seed(0)
        kwargs = dict(gin_channels=32) if isflow else {}
        ref = ref_attn.FFT(self.H, 128, 4, n_layers=2, kernel_size=3,
                           p_dropout=0.0, isflow=isflow, **kwargs)
        ref.eval()

        ours = FFT(self.H, 128, 4, n_layers=2, kernel_size=3,
                   isflow=isflow, gin_channels=32 if isflow else 0)
        params = jax.tree_util.tree_map(
            jnp.asarray, port_fft_state(_np_sd(ref), n_layers=2,
                                        isflow=isflow))

        rng = np.random.default_rng(3)
        x = rng.standard_normal((self.B, self.H, self.T)).astype(np.float32)
        mask = np.ones((self.B, 1, self.T), np.float32)
        mask[1, :, -6:] = 0.0
        g = rng.standard_normal((self.B, 32, self.T)).astype(np.float32)

        with torch.no_grad():
            args = (torch.from_numpy(x), torch.from_numpy(mask))
            want = (ref(*args, g=torch.from_numpy(g)) if isflow
                    else ref(*args)).numpy()
        got = ours.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 1)),
            jnp.asarray(mask.transpose(0, 2, 1)),
            g=jnp.asarray(g.transpose(0, 2, 1)) if isflow else None,
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1), want, atol=TOL, rtol=0)

    def test_causality(self):
        """A perturbation at time t must not change outputs before t."""
        from ttts_tpu.models.attentions_extras import FFT

        ours = FFT(32, 64, 4, n_layers=1, kernel_size=3)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((1, 16, 32)).astype(np.float32))
        mask = jnp.ones((1, 16, 1))
        params = ours.init(jax.random.key(0), x, mask)
        y0 = ours.apply(params, x, mask)
        x2 = x.at[0, 10].add(3.0)
        y1 = ours.apply(params, x2, mask)
        np.testing.assert_allclose(np.asarray(y0[0, :10]),
                                   np.asarray(y1[0, :10]), atol=1e-5, rtol=0)
        assert np.abs(np.asarray(y0[0, 10:]) - np.asarray(y1[0, 10:])).max() > 1e-3


class TestTransformerCouplingLayer:
    B, T, C = 2, 20, 64

    @pytest.fixture(scope="class")
    def bundle(self, ref_attn):
        from ttts_tpu.models.attentions_extras import TransformerCouplingLayer
        from ttts_tpu.models.porting import port_transformer_coupling_state

        torch.manual_seed(0)
        ref = ref_attn.TransformerCouplingLayer(
            self.C, 48, 3, n_layers=2, n_heads=4, p_dropout=0.0,
            filter_channels=96, gin_channels=32)
        ref.eval()
        # zero-init post makes the coupling the identity; randomize so the
        # affine transform actually does something
        with torch.no_grad():
            ref.post.weight.normal_(0, 0.05)
            ref.post.bias.normal_(0, 0.05)

        ours = TransformerCouplingLayer(
            self.C, 48, 3, n_layers=2, n_heads=4, filter_channels=96,
            gin_channels=32)
        params = jax.tree_util.tree_map(
            jnp.asarray, port_transformer_coupling_state(_np_sd(ref),
                                                         n_layers=2))
        rng = np.random.default_rng(5)
        x = rng.standard_normal((self.B, self.C, self.T)).astype(np.float32)
        mask = np.ones((self.B, 1, self.T), np.float32)
        mask[1, :, -4:] = 0.0
        g = rng.standard_normal((self.B, 32, self.T)).astype(np.float32)
        return ref, ours, params, x, mask, g

    def test_forward_parity_and_logdet(self, bundle):
        ref, ours, params, x, mask, g = bundle
        with torch.no_grad():
            want, want_logdet = ref(torch.from_numpy(x),
                                    torch.from_numpy(mask),
                                    g=torch.from_numpy(g))
        got, logdet = ours.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 1)),
            jnp.asarray(mask.transpose(0, 2, 1)),
            g=jnp.asarray(g.transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1), want.numpy(),
            atol=TOL, rtol=0)
        np.testing.assert_allclose(np.asarray(logdet),
                                   want_logdet.numpy(), atol=TOL, rtol=0)

    def test_reverse_parity_and_roundtrip(self, bundle):
        ref, ours, params, x, mask, g = bundle
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(mask),
                       g=torch.from_numpy(g), reverse=True).numpy()
        xj = jnp.asarray(x.transpose(0, 2, 1))
        mj = jnp.asarray(mask.transpose(0, 2, 1))
        gj = jnp.asarray(g.transpose(0, 2, 1))
        got = ours.apply({"params": params}, xj, mj, g=gj, reverse=True)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1), want, atol=TOL, rtol=0)
        # flow invertibility: reverse(forward(x)) == x (masked positions)
        fwd, _ = ours.apply({"params": params}, xj, mj, g=gj)
        back = ours.apply({"params": params}, fwd, mj, g=gj, reverse=True)
        np.testing.assert_allclose(np.asarray(back * mj),
                                   np.asarray(xj * mj), atol=1e-4, rtol=0)


def test_tie_proximal_init():
    """tie_proximal_init copies the q projection onto k (attentions.py:306)."""
    from ttts_tpu.models.attentions_extras import tie_proximal_init
    from ttts_tpu.models.blocks import RelPosMultiHeadAttention

    mha = RelPosMultiHeadAttention(32, 32, 4, proximal_bias=True)
    x = jnp.zeros((1, 8, 32))
    params = mha.init(jax.random.key(0), x, x)["params"]
    tied = tie_proximal_init(params)
    q = tied["Conv1d_0"]["Conv_0"]["kernel"]
    k = tied["Conv1d_1"]["Conv_0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(q), np.asarray(k))


def test_fft_tie_proximal_init():
    """fft_tie_proximal_init ties EVERY attention layer's k to q — the
    reference builds FFT's attentions with proximal_init=True
    (attentions.py:648), so fresh-init training applies this once."""
    from ttts_tpu.models.attentions_extras import FFT, fft_tie_proximal_init

    m = FFT(hidden_channels=32, filter_channels=64, n_heads=2, n_layers=2)
    x = jnp.ones((1, 8, 32))
    mask = jnp.ones((1, 8, 1))
    variables = m.init(jax.random.key(0), x, mask)
    tied = fft_tie_proximal_init(variables)
    names = [k for k in tied["params"]
             if k.startswith("RelPosMultiHeadAttention")]
    assert len(names) == 2
    for n in names:
        np.testing.assert_array_equal(
            np.asarray(tied["params"][n]["Conv1d_1"]["Conv_0"]["kernel"]),
            np.asarray(tied["params"][n]["Conv1d_0"]["Conv_0"]["kernel"]))
        # fresh init starts untied (the helper is not a no-op)
        assert not np.array_equal(
            np.asarray(variables["params"][n]["Conv1d_1"]["Conv_0"]["kernel"]),
            np.asarray(variables["params"][n]["Conv1d_0"]["Conv_0"]["kernel"]))
    # bare-params form accepted too
    bare = fft_tie_proximal_init(variables["params"])
    np.testing.assert_array_equal(
        np.asarray(bare[names[0]]["Conv1d_1"]["Conv_0"]["kernel"]),
        np.asarray(bare[names[0]]["Conv1d_0"]["Conv_0"]["kernel"]))
    out = m.apply(tied, x, mask)
    assert np.isfinite(np.asarray(out)).all()

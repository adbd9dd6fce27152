"""attentions.py stragglers rebuilt: FFT, TransformerCouplingLayer,
depthwise-separable convs.

These classes are dead in the reference's live import graph (zero imports
anywhere under /root/reference/ttts — see docs/PARITY.md §2.13's evidence),
but they are part of the attentions.py surface a migrating user may rely on,
so they are rebuilt here with cross-parity tests against the torch classes
(tests/test_attentions_extras.py). Layout contracts match the rest of this
codebase: channels-last (B, T, C), masks (B, T, 1).

Reference: /root/reference/ttts/vqvae/attentions.py
  - Depthwise_Separable_Conv1D / _TransposeConv1D :439-537
  - FFT :558-647 (causal pre-LN-free decoder stack, optional WaveNet-style
    flow conditioning via fused add-tanh-sigmoid gates)
  - TransformerCouplingLayer :648-708 (affine coupling whose stats network
    is a rel-pos transformer encoder with per-layer flow conditioning)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ttts_tpu.models.blocks import Conv1d, RelPosMultiHeadAttention, ConvFFN


class DepthwiseSeparableConv1d(nn.Module):
    """Depthwise conv (groups=C_in) followed by a 1×1 pointwise conv
    (attentions.Depthwise_Separable_Conv1D:439-485). `weight_norm` mirrors
    the reference's .weight_norm() method being applied to both convs."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0  # torch-style symmetric int padding
    dilation: int = 1
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = Conv1d(in_ch, self.kernel_size, stride=self.stride,
                   dilation=self.dilation, groups=in_ch,
                   use_bias=self.use_bias,
                   padding=(self.padding, self.padding),
                   weight_norm=self.weight_norm)(x)
        return Conv1d(self.features, 1, use_bias=self.use_bias,
                      padding=(0, 0), weight_norm=self.weight_norm)(x)


class DepthwiseSeparableConvTranspose1d(nn.Module):
    """Depthwise transposed conv followed by a 1×1 pointwise conv
    (attentions.Depthwise_Separable_TransposeConv1D:488-537).

    The depthwise transpose is an input-dilated (fractionally-strided)
    depthwise conv — same lowering ConvTranspose1d uses, restricted to
    feature_group_count=C_in. out_len = (T−1)·stride − 2·padding + k."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        # torch ConvTranspose1d(groups=C) weight is (C, 1, K); fan-in = k
        scale = 1.0 / math.sqrt(k)
        init = lambda key, shape: jax.random.uniform(
            key, shape, minval=-scale, maxval=scale)
        kernel = self.param("depth_kernel", init, (k, 1, in_ch))
        if self.weight_norm:
            g = self.param(
                "depth_g",
                lambda rng: jnp.linalg.norm(kernel.reshape(-1, in_ch), axis=0))
            norm = jnp.linalg.norm(kernel.reshape(-1, in_ch), axis=0)
            kernel = kernel * (g / jnp.maximum(norm, 1e-12))
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, 0),
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(s,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=in_ch,
        )
        if self.use_bias:
            bias = self.param("depth_bias", init, (in_ch,))
            y = y + bias
        return Conv1d(self.features, 1, use_bias=self.use_bias,
                      padding=(0, 0), weight_norm=self.weight_norm)(y)


class FFT(nn.Module):
    """Causal transformer stack (attentions.FFT:558-647): per layer, causal
    self-attention (optionally proximal-biased) → post-LN → causal conv FFN
    → post-LN, with optional per-layer WaveNet-style flow conditioning
    (cond_pre 1×1 → fused add-tanh-sigmoid against a weight-normed
    cond_layer projection of g).

    proximal_init (tying conv_k to conv_q at initialization,
    attentions.py:306-310) is an *init-time* action with no forward-pass
    analogue — and the reference constructs FFT's attentions with
    proximal_init=True unconditionally (attentions.py:648). Fresh-init
    TRAINING runs must therefore pass their `FFT.init` output through
    `fft_tie_proximal_init` to match reference defaults (ported-weights
    parity is unaffected; per-layer `tie_proximal_init` also works)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int = 1
    kernel_size: int = 1
    p_dropout: float = 0.0
    proximal_bias: bool = False
    isflow: bool = False
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic=True):
        b, t, h = x.shape
        assert h == self.hidden_channels
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        if g is not None:
            assert self.isflow, "conditioning requires isflow=True"
            g_all = Conv1d(2 * h * self.n_layers, 1, weight_norm=True,
                           padding=(0, 0))(g)
            # cond_pre is ONE module shared across layers in the reference
            # (applied inside the loop, attentions.py:631-639)
            cond_pre = Conv1d(2 * h, 1, padding=(0, 0), name="cond_pre")
        x = x * x_mask
        for i in range(self.n_layers):
            if g is not None:
                x_pre = cond_pre(x)
                g_l = g_all[..., i * 2 * h : (i + 1) * 2 * h]
                acts = x_pre + g_l
                x = jnp.tanh(acts[..., :h]) * jax.nn.sigmoid(acts[..., h:])
            y = RelPosMultiHeadAttention(
                h, h, self.n_heads, p_dropout=self.p_dropout,
                proximal_bias=self.proximal_bias,
            )(x, x, causal, deterministic=deterministic)
            if self.p_dropout > 0:
                y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = nn.LayerNorm()(x + y)
            # causal FFN (attentions.FFN with causal=True: left-pad k−1)
            pad = self.kernel_size - 1
            y = Conv1d(self.filter_channels, self.kernel_size,
                       padding=(pad, 0))(x * x_mask)
            y = jax.nn.relu(y)
            if self.p_dropout > 0:
                y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            y = Conv1d(h, self.kernel_size, padding=(pad, 0))(y * x_mask)
            y = y * x_mask
            if self.p_dropout > 0:
                y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = nn.LayerNorm()(x + y)
        return x * x_mask


class FlowConditionedEncoder(nn.Module):
    """attentions.Encoder with isflow=True (attentions.py:10-89): the
    windowed rel-pos transformer encoder plus per-layer flow conditioning —
    cond_pre 1×1 then a fused add-tanh-sigmoid gate against the layer's
    slice of a weight-normed cond_layer projection of g."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic=True):
        h = self.hidden_channels
        attn_mask = (x_mask[:, None, :, 0][:, :, None, :]
                     * x_mask[:, None, :, 0][:, :, :, None])
        x = x * x_mask
        if g is not None:
            g_all = Conv1d(2 * h * self.n_layers, 1, weight_norm=True,
                           padding=(0, 0))(g)
            cond_pre = Conv1d(2 * h, 1, padding=(0, 0), name="cond_pre")
        for i in range(self.n_layers):
            if g is not None:
                x_pre = cond_pre(x)
                g_l = g_all[..., i * 2 * h : (i + 1) * 2 * h]
                acts = x_pre + g_l
                x = jnp.tanh(acts[..., :h]) * jax.nn.sigmoid(acts[..., h:])
            y = RelPosMultiHeadAttention(
                h, h, self.n_heads, window_size=self.window_size,
                p_dropout=self.p_dropout,
            )(x, x, attn_mask, deterministic=deterministic)
            if self.p_dropout > 0:
                y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = nn.LayerNorm()(x + y)
            y = ConvFFN(h, self.filter_channels, self.kernel_size,
                        self.p_dropout)(x, x_mask,
                                        deterministic=deterministic)
            if self.p_dropout > 0:
                y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = nn.LayerNorm()(x + y)
        return x * x_mask


class TransformerCouplingLayer(nn.Module):
    """Affine coupling with a transformer stats network
    (attentions.TransformerCouplingLayer:648-708). Split channels in half;
    the first half parameterizes (m, logs) for the second through
    pre 1×1 → FlowConditionedEncoder → zero-init post 1×1.

    __call__(x, x_mask, g, reverse): forward returns (x, logdet);
    reverse returns x only — matching the reference's asymmetric API."""

    channels: int
    hidden_channels: int
    kernel_size: int
    n_layers: int
    n_heads: int
    p_dropout: float = 0.0
    filter_channels: int = 0
    mean_only: bool = False
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        hid = Conv1d(self.hidden_channels, 1, padding=(0, 0))(x0) * x_mask
        hid = FlowConditionedEncoder(
            self.hidden_channels, self.filter_channels, self.n_heads,
            self.n_layers, self.kernel_size, self.p_dropout,
            gin_channels=self.gin_channels,
        )(hid, x_mask, g=g, deterministic=deterministic)
        # post conv is zero-initialized in the reference (:689-690) so the
        # coupling starts as the identity
        stats = nn.Conv(half * (2 - self.mean_only), (1,), padding="VALID",
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="post")(hid) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = stats[..., :half], stats[..., half:]
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


def tie_proximal_init(mha_params: dict) -> dict:
    """Replicate attentions.MultiHeadAttention's proximal_init (:306-310):
    copy the query projection's kernel/bias onto the key projection of an
    initialized RelPosMultiHeadAttention subtree (Conv1d_0 → Conv1d_1)."""
    out = jax.tree_util.tree_map(lambda a: a, mha_params)  # shallow copy
    out["Conv1d_1"] = jax.tree_util.tree_map(lambda a: a,
                                             mha_params["Conv1d_0"])
    return out


def fft_tie_proximal_init(variables: dict) -> dict:
    """Apply proximal_init to EVERY attention layer of a fresh `FFT.init`
    tree — the reference builds FFT's MultiHeadAttention with
    proximal_init=True unconditionally (attentions.py:648), so fresh-init
    training from reference defaults needs this applied once after init.

    Accepts either the full `{'params': ...}` variables dict or the bare
    params subtree; returns the same structure with each
    RelPosMultiHeadAttention_* key projection tied to its query projection."""
    inner = variables.get("params", variables)
    tied = dict(inner)
    for name, sub in inner.items():
        if name.startswith("RelPosMultiHeadAttention"):
            tied[name] = tie_proximal_init(sub)
    if "params" in variables:
        out = dict(variables)
        out["params"] = tied
        return out
    return tied

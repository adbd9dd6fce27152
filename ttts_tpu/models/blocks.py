"""Neural building blocks (flax.linen, channels-last NWC layout).

Re-designed TPU-first equivalents of the reference's module zoo
(ttts/vqvae/modules.py, ttts/vqvae/attentions.py, ttts/vqvae/activations.py,
ttts/vqvae/alias_free_torch/). All tensors are (B, T, C); masks are
(B, T, 1) floats. Convolutions use explicit torch-compatible padding so
sequence-length math matches the reference exactly.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


def sequence_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) lengths → (B, max_len, 1) float mask (commons.sequence_mask)."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)[..., None]


def _torch_same_pad(kernel: int, dilation: int = 1) -> Tuple[int, int]:
    p = (kernel * dilation - dilation) // 2
    return (p, p)


class Conv1d(nn.Module):
    """1D conv, NWC, torch-compatible 'same' padding by default."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    padding: Optional[Tuple[int, int]] = None  # None → torch same
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        pad = self.padding if self.padding is not None else _torch_same_pad(self.kernel_size, self.dilation)
        conv = nn.Conv(
            self.features,
            (self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            padding=[pad],
        )
        if self.weight_norm:
            conv = nn.WeightNorm(conv)
        return conv(x)


class ConvTranspose1d(nn.Module):
    """Transposed 1D conv matching torch ConvTranspose1d(k, stride, padding=p):
    out_len = (T-1)*stride - 2p + k. Implemented as an input-dilated conv
    (fractionally-strided), which XLA lowers to an MXU-friendly conv."""

    features: int
    kernel_size: int
    stride: int
    torch_padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.torch_padding
        in_ch = x.shape[-1]
        # torch convT init: U(-sqrt(g), sqrt(g)) with g = 1/(out_ch/... ) — use
        # the same fan-in rule torch uses: groups/(in_ch*k)
        scale = 1.0 / math.sqrt(in_ch * k)
        init = lambda key, shape: jax.random.uniform(key, shape, minval=-scale, maxval=scale)
        kernel = self.param("kernel", init, (k, in_ch, self.features))
        if self.weight_norm:
            g = self.param(
                "g", lambda rng: jnp.linalg.norm(kernel.reshape(-1, self.features), axis=0)
            )
            norm = jnp.linalg.norm(kernel.reshape(-1, self.features), axis=0)
            kernel = kernel * (g / jnp.maximum(norm, 1e-12))
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, 0),
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(s,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bias = self.param("bias", init, (self.features,))
            y = y + bias
        return y


class LayerNorm1d(nn.Module):
    """LayerNorm over the channel axis (modules.LayerNorm:20)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm()(x)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class Snake(nn.Module):
    """x + (1/α)·sin²(αx) (activations.Snake:9-60)."""

    channels: int
    alpha_logscale: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
        return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


class SnakeBeta(nn.Module):
    """x + 1/(β+eps)·sin²(αx) with log-scale per-channel α, β
    (activations.SnakeBeta:62-120, alpha_logscale=True)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        log_alpha = self.param("log_alpha", nn.initializers.zeros, (self.channels,))
        log_beta = self.param("log_beta", nn.initializers.zeros, (self.channels,))
        alpha = jnp.exp(log_alpha)
        beta = jnp.exp(log_beta)
        return x + (1.0 / (beta + 1e-9)) * jnp.sin(alpha * x) ** 2


# ---------------------------------------------------------------------------
# Anti-aliased activation (BigVGAN alias_free: act.py/filter.py/resample.py)
# ---------------------------------------------------------------------------


def _kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """(kernel_size,) lowpass kernel (alias_free_torch/filter.py:28-58)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def _depthwise_conv(x, filt, stride=1, lhs_dilation=1, pad=(0, 0)):
    """x: (B,T,C), filt: (k,) applied per channel."""
    c = x.shape[-1]
    kernel = jnp.tile(filt[:, None, None], (1, 1, c))  # (k, 1, C)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[pad],
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )


class AntiAliasedActivation(nn.Module):
    """2× upsample → activation → 2× downsample (alias_free_torch/act.py:8).

    Used around SnakeBeta in the codec encoder (vq2.py AMPBlock1 /
    PosteriorAudioEncoder activation_post)."""

    channels: int
    up_kernel: int = 12
    down_kernel: int = 12

    @nn.compact
    def __call__(self, x):
        ratio = 2
        k = self.up_kernel
        filt_up = jnp.asarray(_kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k))
        # UpSample1d (resample.py:10-33): replicate-pad, dilated conv, trim
        pad = k // ratio - 1
        pad_left = pad * ratio + (k - ratio) // 2
        pad_right = pad * ratio + (k - ratio + 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        up = ratio * _depthwise_conv(
            xp, jnp.flip(filt_up), stride=1, lhs_dilation=ratio, pad=(k - 1, k - 1)
        )
        up = up[:, pad_left : up.shape[1] - pad_right]

        up = SnakeBeta(self.channels)(up)

        # DownSample1d (resample.py:36-48) = LowPassFilter1d stride 2
        kd = self.down_kernel
        filt_dn = jnp.asarray(_kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kd))
        even = kd % 2 == 0
        dn = jnp.pad(
            up, ((0, 0), (kd // 2 - int(even), kd // 2), (0, 0)), mode="edge"
        )
        return _depthwise_conv(dn, filt_dn, stride=ratio)


# ---------------------------------------------------------------------------
# WaveNet-style gated stack (modules.WN:136-222)
# ---------------------------------------------------------------------------


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic=True):
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        if g is not None:
            if g.ndim == 2:  # global style vector (B, C) → (B, 1, C)
                g = g[:, None, :]
            g_all = Conv1d(2 * h * self.n_layers, 1, weight_norm=True, padding=(0, 0))(g)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            x_in = Conv1d(2 * h, self.kernel_size, dilation=dilation, weight_norm=True)(x)
            if g is not None:
                x_in = x_in + g_all[..., i * 2 * h : (i + 1) * 2 * h]
            # fused add-tanh-sigmoid gate (commons.fused_add_tanh_sigmoid_multiply)
            acts = jnp.tanh(x_in[..., :h]) * jax.nn.sigmoid(x_in[..., h:])
            if self.p_dropout > 0:
                acts = nn.Dropout(self.p_dropout)(acts, deterministic=deterministic)
            out_ch = 2 * h if i < self.n_layers - 1 else h
            res_skip = Conv1d(out_ch, 1, weight_norm=True, padding=(0, 0))(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask


class ResBlock1(nn.Module):
    """HiFi-GAN ResBlock1 (modules.py:224-320)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x, x_mask=None):
        for d in self.dilations:
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=d, weight_norm=True)(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=1, weight_norm=True)(xt)
            x = x + xt
        if x_mask is not None:
            x = x * x_mask
        return x


# ---------------------------------------------------------------------------
# VITS relative-position transformer (attentions.py:10-437)
# ---------------------------------------------------------------------------


def _rel_to_abs(x: jax.Array) -> jax.Array:
    """[b,h,l,2l-1] rel-indexed logits → [b,h,l,l] absolute (skew trick,
    attentions.py _relative_position_to_absolute_position)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1 :]


def _abs_to_rel(x: jax.Array) -> jax.Array:
    """[b,h,l,l] → [b,h,l,2l-1] (attentions.py _absolute_position_to_relative_position)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l * l + l * (l - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (l, 0)))
    return x.reshape(b, h, l, 2 * l)[:, :, :, 1:]


def _get_rel_embeddings(emb: jax.Array, length: int, window_size: int) -> jax.Array:
    """Pad/slice the (heads, 2w+1, d) table to (heads, 2*length-1, d)."""
    pad_len = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    emb = jnp.pad(emb, ((0, 0), (pad_len, pad_len), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


class RelPosMultiHeadAttention(nn.Module):
    """Self/cross attention with optional windowed relative-position bias
    (attentions.MultiHeadAttention:177-437, window_size=4, heads_share)."""

    channels: int
    out_channels: int
    n_heads: int
    window_size: Optional[int] = None
    p_dropout: float = 0.0
    heads_share: bool = True
    # score scale; None → 1/sqrt(d_k) (attentions.py:248). MelStyleEncoder's
    # attention divides by sqrt(d_model) instead (modules.py:620-621).
    qk_scale: Optional[float] = None
    # −log1p(|i−j|) additive proximity bias (attentions.py:356-365,
    # _attention_bias_proximal); self-attention only. Used by FFT.
    proximal_bias: bool = False

    @nn.compact
    def __call__(self, x, c, attn_mask=None, deterministic=True):
        d = self.channels
        h = self.n_heads
        dk = d // h
        scale = self.qk_scale if self.qk_scale is not None else 1.0 / math.sqrt(dk)
        q = Conv1d(d, 1, padding=(0, 0))(x)
        k = Conv1d(d, 1, padding=(0, 0))(c)
        v = Conv1d(d, 1, padding=(0, 0))(c)

        b, t_t, _ = q.shape
        t_s = k.shape[1]
        qh = q.reshape(b, t_t, h, dk).transpose(0, 2, 1, 3)
        kh = k.reshape(b, t_s, h, dk).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t_s, h, dk).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhld,bhmd->bhlm", qh * scale, kh)
        if self.window_size is not None:
            assert t_s == t_t, "relative attention is self-attention only"
            n_rel = 1 if self.heads_share else h
            emb_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(dk**-0.5),
                (n_rel, 2 * self.window_size + 1, dk),
            )
            emb_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(dk**-0.5),
                (n_rel, 2 * self.window_size + 1, dk),
            )
            rel_k = _get_rel_embeddings(emb_k, t_t, self.window_size)
            rel_logits = jnp.einsum("bhld,xmd->bhlm", qh / math.sqrt(dk), rel_k)
            scores = scores + _rel_to_abs(rel_logits)
        if self.proximal_bias:
            assert t_s == t_t, "proximal bias is self-attention only"
            r = jnp.arange(t_t)
            scores = scores + (
                -jnp.log1p(jnp.abs(r[None, :] - r[:, None]))
            )[None, None].astype(scores.dtype)
        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p = jax.nn.softmax(scores, axis=-1)
        if self.p_dropout > 0:
            p = nn.Dropout(self.p_dropout)(p, deterministic=deterministic)
        out = jnp.einsum("bhlm,bhmd->bhld", p, vh)
        if self.window_size is not None:
            rel_w = _abs_to_rel(p)
            rel_v = _get_rel_embeddings(emb_v, t_t, self.window_size)
            out = out + jnp.einsum("bhlm,xmd->bhld", rel_w, rel_v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t_t, d)
        return Conv1d(self.out_channels, 1, padding=(0, 0))(out)


class ConvFFN(nn.Module):
    """conv→relu→conv FFN (attentions.FFN:377-437)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, deterministic=True):
        x = Conv1d(self.filter_channels, self.kernel_size)(x * x_mask)
        x = jax.nn.relu(x)
        if self.p_dropout > 0:
            x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = Conv1d(self.out_channels, self.kernel_size)(x * x_mask)
        return x * x_mask


class TransformerEncoder(nn.Module):
    """Post-LN transformer with windowed rel-pos attention
    (attentions.Encoder:10-89)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4

    @nn.compact
    def __call__(self, x, x_mask, deterministic=True):
        attn_mask = x_mask[:, None, :, 0][:, :, None, :] * x_mask[:, None, :, 0][:, :, :, None]
        x = x * x_mask
        for _ in range(self.n_layers):
            y = RelPosMultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                window_size=self.window_size,
                p_dropout=self.p_dropout,
            )(x, x, attn_mask, deterministic=deterministic)
            if self.p_dropout > 0:
                y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = nn.LayerNorm()(x + y)
            y = ConvFFN(
                self.hidden_channels, self.filter_channels, self.kernel_size, self.p_dropout
            )(x, x_mask, deterministic=deterministic)
            if self.p_dropout > 0:
                y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = nn.LayerNorm()(x + y)
        return x * x_mask


class TransformerDecoder(nn.Module):
    """Causal self-attention + cross-attention decoder
    (attentions.Decoder:91-176): per layer, causal self-attn (proximal-bias
    free) → LN → cross-attn to the encoder memory → LN → causal conv FFN → LN.
    """

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, h, h_mask, deterministic=True):
        t = x.shape[1]
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        self_mask = causal & (
            (x_mask[:, None, :, 0][:, :, None, :] * x_mask[:, None, :, 0][:, :, :, None]) > 0
        )
        cross_mask = (
            x_mask[:, None, :, 0][:, :, :, None] * h_mask[:, None, :, 0][:, :, None, :]
        )
        x = x * x_mask
        for _ in range(self.n_layers):
            y = RelPosMultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout,
            )(x, x, self_mask, deterministic=deterministic)
            x = nn.LayerNorm()(x + y)
            y = RelPosMultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout,
            )(x, h, cross_mask, deterministic=deterministic)
            x = nn.LayerNorm()(x + y)
            # causal conv FFN (attentions.FFN causal padding)
            pad = self.kernel_size - 1
            y = Conv1d(self.filter_channels, self.kernel_size, padding=(pad, 0))(x * x_mask)
            y = jax.nn.relu(y)
            y = Conv1d(self.hidden_channels, self.kernel_size, padding=(pad, 0))(y * x_mask)
            x = nn.LayerNorm()(x + y * x_mask)
        return x * x_mask


# ---------------------------------------------------------------------------
# Style encoder (modules.MelStyleEncoder:686-766)
# ---------------------------------------------------------------------------


class Conv1dGLU(nn.Module):
    """conv → GLU gate with residual (modules.Conv1dGLU)."""

    channels: int
    kernel_size: int
    p_dropout: float

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = Conv1d(2 * self.channels, self.kernel_size)(x)
        a, b = jnp.split(h, 2, axis=-1)
        g = a * jax.nn.sigmoid(b)
        # dropout on the gated branch only (modules.py:566: residual + dropout(x))
        if self.p_dropout > 0:
            g = nn.Dropout(self.p_dropout)(g, deterministic=deterministic)
        return x + g


class MelStyleEncoderVAE(nn.Module):
    """Variational style encoder (modules.MelStyleEncoderVAE:767-816):
    MelStyleEncoder → (μ, logvar) heads → reparameterized z → style embed,
    with a standard-normal KL penalty (σ = exp(logvar), reference convention)."""

    spec_channels: int
    z_latent_dim: int
    emb_dim: int

    def setup(self):
        self.ref_encoder = MelStyleEncoder(
            n_mel_channels=self.spec_channels, style_vector_dim=self.emb_dim
        )
        self.fc1 = nn.Dense(self.z_latent_dim)
        self.fc2 = nn.Dense(self.z_latent_dim)
        self.fc3 = nn.Dense(self.emb_dim)

    def __call__(self, x, mask=None, train: bool = False):
        enc = self.ref_encoder(x, mask, deterministic=not train)
        mu = self.fc1(enc)
        logvar = self.fc2(enc)
        sigma = jnp.exp(logvar)
        # KL(N(mu, sigma) || N(0, 1)), mean over batch and dims
        kl = jnp.mean(0.5 * (sigma**2 + mu**2 - 1.0) - logvar)
        if train:
            eps = jax.random.normal(self.make_rng("noise"), mu.shape)
            z = mu + eps * sigma
        else:
            z = mu
        return self.fc3(z), kl

    def infer(self, z):
        """Style from a prior sample / manual latent (modules.py infer)."""
        return self.fc3(z)


class MelStyleEncoder(nn.Module):
    """Spectral MLP → Conv1dGLU×2 → self-attention → masked temporal pooling
    → style vector (modules.MelStyleEncoder:686-766). Input (B, T, n_mel),
    mask (B, T, 1); returns (B, style_vector_dim)."""

    n_mel_channels: int = 80
    style_hidden: int = 128
    style_vector_dim: int = 256
    style_kernel_size: int = 5
    style_head: int = 2
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        # spectral
        x = nn.Dense(self.style_hidden)(x)
        x = mish(x)
        if self.p_dropout > 0:
            x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.style_hidden)(x)
        x = mish(x)
        if self.p_dropout > 0:
            x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        # temporal
        x = Conv1dGLU(self.style_hidden, self.style_kernel_size, self.p_dropout)(
            x, deterministic
        )
        x = Conv1dGLU(self.style_hidden, self.style_kernel_size, self.p_dropout)(
            x, deterministic
        )
        # self attention
        if mask is not None:
            x = x * mask
            attn_mask = mask[:, None, :, 0][:, :, None, :] * mask[:, None, :, 0][:, :, :, None]
        else:
            attn_mask = None
        # the reference's ScaledDotProductAttention divides by sqrt(d_model),
        # not sqrt(d_k) (modules.py:620-621 temperature=d_model**0.5)
        x = x + RelPosMultiHeadAttention(
            self.style_hidden, self.style_hidden, self.style_head,
            p_dropout=self.p_dropout, qk_scale=self.style_hidden**-0.5,
        )(x, x, attn_mask, deterministic=deterministic)
        x = nn.Dense(self.style_vector_dim)(x)
        # masked temporal average pool
        if mask is not None:
            w = jnp.sum(x * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        else:
            w = jnp.mean(x, axis=1)
        return w

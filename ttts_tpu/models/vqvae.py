"""VQ-VAE-GAN codec (TPU-native rebuild of ttts/vqvae/vq2.py SynthesizerTrn:749).

A GPT-SoVITS-style VITS codec:
  wav ──┬─ spectrogram ─ MelStyleEncoder (ref_enc, vq2.py:832) ─→ global style ge
        ├─ PosteriorAudioEncoder enc_p (vq2.py:667-750: conv downsample stack
        │  [10,8,2,2,2] over raw audio + WN over the spectrogram, SnakeBeta)
        │  ─→ stride-2 proj (vq2.py:836) ─→ RVQ (n_q=1, bins=1024, vq2.py:835)
        │  ─→ 2× nearest upsample ─→ TextEncoder enc_p_2 (vq2.py:95-162:
        │  SSL-enc + text-emb + MRTE cross-attn, vq2.py:17-48) → (m_p, logs_p)
        ├─ posterior enc_q (same class) → z → flow (ResidualCouplingBlock,
        │  vq2.py:210-252) → z_p
        └─ HiFi-GAN Generator dec (vq2.py:341-415) on random z slices → 32 kHz

All modules are channels-last; random streams are explicit ('noise' for the
reparameterized posteriors, 'slice' for rand_slice_segments, 'vq' for codebook
expiry/k-means).

The broken reference methods (decode: vq2.py:892-911 references undefined
variables) are implemented here with their *intended* semantics, recovered
from infer (vq2.py:873-890).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttts_tpu.config import VQVAEConfig
from ttts_tpu.models import blocks
from ttts_tpu.models.blocks import (
    Conv1d,
    ConvTranspose1d,
    MelStyleEncoder,
    ResBlock1,
    TransformerEncoder,
    RelPosMultiHeadAttention,
    WN,
    sequence_mask,
)
from ttts_tpu.models.quantize import RVQState, rvq_decode, rvq_encode, rvq_forward, rvq_init


class ResidualVQ(nn.Module):
    """linen wrapper owning the EMA codebook as a 'codebook' variable."""

    dim: int
    n_q: int = 1
    bins: int = 1024
    decay: float = 0.99
    # "farthest_point" (our fix) or "uniform" (the reference's exact
    # core_vq.py:76 seeding, for training-dynamics parity studies)
    kmeans_seeding: str = "farthest_point"

    def setup(self):
        self._cb = self.variable(
            "codebook",
            "state",
            lambda: rvq_init(jax.random.key(0), self.n_q, self.bins, self.dim),
        )

    def __call__(self, x, train: bool = False):
        var = self._cb
        if train and not self.is_initializing():
            key = self.make_rng("vq")
        else:
            key = jax.random.key(0)
        q, codes, loss, new_state = rvq_forward(
            var.value, x, key, train=train and not self.is_initializing(),
            decay=self.decay, kmeans_seeding=self.kmeans_seeding,
        )
        if train and not self.is_initializing():
            var.value = new_state
        return q, codes, loss

    def encode(self, x):
        return rvq_encode(self._cb.value, x)

    def decode(self, codes):
        return rvq_decode(self._cb.value, codes)


class MRTE(nn.Module):
    """Multi-reference timbre encoder: cross-attention from content frames to
    text, plus global style (vq2.py:17-48)."""

    hidden_size: int = 512
    out_channels: int = 192
    n_heads: int = 4

    @nn.compact
    def __call__(self, ssl_enc, ssl_mask, text, text_mask, ge, deterministic=True):
        attn_mask = ssl_mask[:, None, :, 0][:, :, :, None] * text_mask[:, None, :, 0][:, :, None, :]
        ssl = Conv1d(self.hidden_size, 1, padding=(0, 0))(ssl_enc * ssl_mask)
        txt = Conv1d(self.hidden_size, 1, padding=(0, 0))(text * text_mask)
        x = (
            RelPosMultiHeadAttention(self.hidden_size, self.hidden_size, self.n_heads)(
                ssl * ssl_mask, txt * text_mask, attn_mask, deterministic=deterministic
            )
            + ssl
            + ge[:, None, :]
        )
        return Conv1d(self.out_channels, 1, padding=(0, 0))(x * ssl_mask)


class TextEncoder(nn.Module):
    """Quantized-content + text prior encoder (vq2.py:95-162)."""

    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    n_text_tokens: int = 256
    mrte_hidden: int = 512  # must equal gin_channels (ge is added in MRTE)

    @nn.compact
    def __call__(self, y, y_mask, text, text_mask, ge, deterministic=True):
        y = TransformerEncoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers // 2,
            self.kernel_size,
            self.p_dropout,
        )(y * y_mask, y_mask, deterministic=deterministic)

        t = nn.Embed(self.n_text_tokens, self.hidden_channels)(text)
        t = TransformerEncoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
        )(t * text_mask, text_mask, deterministic=deterministic)

        y = MRTE(hidden_size=self.mrte_hidden, out_channels=self.hidden_channels)(
            y, y_mask, t, text_mask, ge, deterministic
        )

        y = TransformerEncoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers // 2,
            self.kernel_size,
            self.p_dropout,
        )(y * y_mask, y_mask, deterministic=deterministic)

        stats = Conv1d(self.out_channels * 2, 1, padding=(0, 0))(y) * y_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return y, m, logs


class ResidualCouplingLayer(nn.Module):
    """Affine (mean-only) coupling with a WN conditioner
    (modules.ResidualCouplingLayer:405-460)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.channels // 2
        x0, x1 = jnp.split(x, 2, axis=-1)
        h = Conv1d(self.hidden_channels, 1, padding=(0, 0))(x0) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate, self.n_layers,
               gin_channels=self.gin_channels)(h, x_mask, g=g)
        # zero-initialized post projection (reference zeroes weight and bias)
        m = nn.Dense(half, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(h) * x_mask
        if not reverse:
            x1 = (m + x1) * x_mask
        else:
            x1 = (x1 - m) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    """4× (coupling + flip) (vq2.py:210-252)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        layers = [
            ResidualCouplingLayer(
                self.channels,
                self.hidden_channels,
                self.kernel_size,
                self.dilation_rate,
                self.n_layers,
                gin_channels=self.gin_channels,
            )
            for _ in range(self.n_flows)
        ]
        order = range(self.n_flows) if not reverse else reversed(range(self.n_flows))
        for i in order:
            if not reverse:
                x = layers[i](x, x_mask, g=g, reverse=False)
                x = jnp.flip(x, axis=-1)  # modules.Flip
            else:
                x = jnp.flip(x, axis=-1)
                x = layers[i](x, x_mask, g=g, reverse=True)
        return x


class Generator(nn.Module):
    """HiFi-GAN generator (vq2.py:341-415): conv_pre → 5× (lrelu → convT
    upsample → 3-kernel ResBlock bank avg) → lrelu → conv_post → tanh."""

    initial_channel: int
    resblock_kernel_sizes: Tuple[int, ...]
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...]
    upsample_rates: Tuple[int, ...]
    upsample_initial_channel: int
    upsample_kernel_sizes: Tuple[int, ...]
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, g=None):
        x = Conv1d(self.upsample_initial_channel, 7)(x)
        if g is not None:
            x = x + Conv1d(self.upsample_initial_channel, 1, padding=(0, 0))(g[:, None, :])
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, blocks.LRELU_SLOPE)
            x = ConvTranspose1d(ch, k, u, torch_padding=(k - u) // 2, weight_norm=True)(x)
            xs = None
            for kk, dd in zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes):
                r = ResBlock1(ch, kk, tuple(dd))(x)
                xs = r if xs is None else xs + r
            x = xs / len(self.resblock_kernel_sizes)
        x = nn.leaky_relu(x)
        x = Conv1d(1, 7, use_bias=False)(x)
        return jnp.tanh(x)


class PosteriorAudioEncoder(nn.Module):
    """Dual-path posterior: raw-audio downsample stack [10,8,2,2,2] with
    HiFi-GAN ResBlocks + SnakeBeta, concatenated with a WN encoding of the
    spectrogram (vq2.py:667-750)."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0
    # raw-audio downsample stack; defaults are the reference's (vq2.py:690-707)
    down_rates: Tuple[int, ...] = (10, 8, 2, 2, 2)
    down_kernels: Tuple[int, ...] = (16, 16, 8, 2, 2)
    down_channels: Tuple[int, ...] = (16, 32, 64, 96, 128, 192)
    rb_kernels: Tuple[int, ...] = (3, 7, 11)
    rb_dils: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))

    @nn.compact
    def __call__(self, spec, audio, x_mask, g=None, noise_key=None):
        down_rates = self.down_rates
        down_kernels = self.down_kernels
        chans = self.down_channels
        rb_kernels = self.rb_kernels
        rb_dils = self.rb_dils

        a = Conv1d(16, 7)(audio)
        for i, (u, k) in enumerate(zip(down_rates, down_kernels)):
            a = Conv1d(chans[i + 1], k, stride=u, padding=((k - 1) // 2, (k - 1) // 2),
                       weight_norm=True)(a)
            xs = None
            for kk, dd in zip(rb_kernels, rb_dils):
                r = ResBlock1(chans[i + 1], kk, dd)(a)
                xs = r if xs is None else xs + r
            a = xs / len(rb_kernels)
        a = blocks.AntiAliasedActivation(chans[-1])(a)
        a = Conv1d(self.hidden_channels, 7)(a)

        x = Conv1d(self.hidden_channels, 1, padding=(0, 0))(spec) * x_mask
        x = WN(self.hidden_channels, self.kernel_size, self.dilation_rate, self.n_layers,
               gin_channels=self.gin_channels)(x, x_mask, g=g)

        a = a * x_mask
        x = jnp.concatenate([x, a], axis=-1)
        stats = Conv1d(self.out_channels * 2, 1, padding=(0, 0))(x) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        if noise_key is not None:
            z = (m + jax.random.normal(noise_key, m.shape) * jnp.exp(logs)) * x_mask
        else:
            z = m * x_mask
        return z, m, logs


def rand_slice_segments(key, x, lengths, segment_frames: int):
    """Random fixed-size slices (commons.rand_slice_segments). x: (B, T, C)."""
    b, t, _ = x.shape
    max_start = jnp.maximum(lengths - segment_frames, 0)
    ids = (jax.random.uniform(key, (b,)) * (max_start + 1)).astype(jnp.int32)
    sliced = jax.vmap(
        lambda xi, s: jax.lax.dynamic_slice_in_dim(xi, s, segment_frames, axis=0)
    )(x, ids)
    return sliced, ids


def slice_segments(x, ids, segment_frames: int):
    return jax.vmap(
        lambda xi, s: jax.lax.dynamic_slice_in_dim(xi, s, segment_frames, axis=0)
    )(x, ids)


class SynthesizerTrn(nn.Module):
    """The trainable codec (vq2.py:749-920). Channels-last everywhere:
    spec (B, T, spec_channels), wav (B, T*hop, 1), text (B, L) int ids."""

    cfg: VQVAEConfig
    spec_channels: int = 1025
    segment_frames: int = 32  # 20480 samples / 640 hop

    def setup(self):
        c = self.cfg
        self.ref_enc = MelStyleEncoder(
            n_mel_channels=self.spec_channels, style_vector_dim=c.gin_channels
        )
        post_kw = dict(
            down_rates=c.posterior_down_rates,
            down_kernels=c.posterior_down_kernels,
            down_channels=c.posterior_down_channels,
            rb_kernels=c.posterior_rb_kernels,
            rb_dils=c.posterior_rb_dilations,
        )
        self.enc_p = PosteriorAudioEncoder(
            self.spec_channels, c.inter_channels, c.hidden_channels,
            5, 1, c.posterior_wn_layers, gin_channels=c.gin_channels, **post_kw,
        )
        self.enc_q = PosteriorAudioEncoder(
            self.spec_channels, c.inter_channels, c.hidden_channels,
            5, 1, c.posterior_wn_layers, gin_channels=c.gin_channels, **post_kw,
        )
        self.enc_p_2 = TextEncoder(
            c.inter_channels, c.hidden_channels, c.filter_channels,
            c.n_heads, c.n_layers, c.kernel_size, c.p_dropout,
            n_text_tokens=c.n_text_tokens, mrte_hidden=c.gin_channels,
        )
        self.flow = ResidualCouplingBlock(
            c.inter_channels, c.hidden_channels, 5, 1, c.flow_wn_layers,
            n_flows=c.flow_layers, gin_channels=c.gin_channels,
        )
        self.dec = Generator(
            c.inter_channels,
            c.resblock_kernel_sizes,
            c.resblock_dilation_sizes,
            c.upsample_rates,
            c.upsample_initial_channel,
            c.upsample_kernel_sizes,
            gin_channels=c.gin_channels,
        )
        self.quantizer = ResidualVQ(
            dim=c.inter_channels, n_q=c.n_q, bins=c.codebook_bins,
            decay=c.codebook_decay, kmeans_seeding=c.kmeans_seeding,
        )
        # stride-2 content projection (vq2.py:836) — 25 Hz semantic rate
        self.proj = Conv1d(c.inter_channels, 2, stride=2, padding=(0, 0))

    def _content_codes(self, spec, wav, y_mask, ge, train: bool):
        x, _, _ = self.enc_p(spec, wav, y_mask, g=ge)
        x = self.proj(x)
        q, codes, commit_loss = self.quantizer(x, train=train)
        # 2× nearest upsample back to the spec frame rate (vq2.py:853)
        q = jnp.repeat(q, 2, axis=1)
        return q, codes, commit_loss

    def __call__(self, wav, wav_aug, spec, spec_aug, spec_lengths, text, text_lengths,
                 train: bool = True):
        c = self.cfg
        y_mask = sequence_mask(spec_lengths, spec.shape[1])
        ge = self.ref_enc(spec * y_mask, y_mask, deterministic=not train)

        quantized, codes, commit_loss = self._content_codes(
            spec_aug, wav_aug, y_mask, ge, train
        )
        text_mask = sequence_mask(text_lengths, text.shape[1])
        _, m_p, logs_p = self.enc_p_2(
            quantized, y_mask, text, text_mask, ge, deterministic=not train
        )
        nk = self.make_rng("noise") if train else None
        z, m_q, logs_q = self.enc_q(spec, wav, y_mask, g=ge, noise_key=nk)
        z_p = self.flow(z, y_mask, g=ge)

        if train:
            z_slice, ids_slice = rand_slice_segments(
                self.make_rng("slice"), z, spec_lengths, self.segment_frames
            )
        else:
            z_slice, ids_slice = z[:, : self.segment_frames], jnp.zeros(
                (z.shape[0],), jnp.int32
            )
        o = self.dec(z_slice, g=ge)
        return o, commit_loss, ids_slice, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q), quantized

    def infer(self, wav, spec, spec_lengths, text, text_lengths, noise_scale: float = 0.5):
        """Full reconstruction path (vq2.py:873-890)."""
        y_mask = sequence_mask(spec_lengths, spec.shape[1])
        ge = self.ref_enc(spec * y_mask, y_mask)
        quantized, codes, _ = self._content_codes(spec, wav, y_mask, ge, train=False)
        text_mask = sequence_mask(text_lengths, text.shape[1])
        _, m_p, logs_p = self.enc_p_2(quantized, y_mask, text, text_mask, ge)
        noise = jax.random.normal(self.make_rng("noise"), m_p.shape)
        z_p = m_p + noise * jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p, y_mask, g=ge, reverse=True)
        return self.dec(z * y_mask, g=ge)

    def decode(self, codes, text, refer_spec, noise_scale: float = 0.5):
        """codes + text + reference spec → wav. Intended semantics of the
        reference's broken decode (vq2.py:892-911)."""
        refer_mask = jnp.ones(refer_spec.shape[:2] + (1,), refer_spec.dtype)
        ge = self.ref_enc(refer_spec, refer_mask)
        quantized = self.quantizer.decode(codes)
        quantized = jnp.repeat(quantized, 2, axis=1)
        y_mask = jnp.ones(quantized.shape[:2] + (1,), quantized.dtype)
        text_mask = jnp.ones(text.shape + (1,), jnp.float32)
        _, m_p, logs_p = self.enc_p_2(quantized, y_mask, text, text_mask, ge)
        noise = jax.random.normal(self.make_rng("noise"), m_p.shape)
        z_p = m_p + noise * jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p, y_mask, g=ge, reverse=True)
        return self.dec(z * y_mask, g=ge)

    def extract_code(self, wav, spec, spec_lengths):
        """wav+spec → semantic VQ codes (B, n_q, T/2) (vq2.py:912-919 /
        rvq1.py:368-373 — produces the `.vq.pth` GPT vocabulary)."""
        y_mask = sequence_mask(spec_lengths, spec.shape[1])
        ge = self.ref_enc(spec * y_mask, y_mask)
        x, _, _ = self.enc_p(spec, wav, y_mask, g=ge)
        x = self.proj(x * y_mask)
        codes = self.quantizer.encode(x)  # (n_q, B, T/2)
        return jnp.transpose(codes, (1, 0, 2))

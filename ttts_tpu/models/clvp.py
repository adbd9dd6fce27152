"""CLVP — contrastive text↔speech-code reranker.

TPU-native rebuild of ttts/clvp/model.py:19-141: dual transformer encoders
over BPE text tokens and speech VQ tokens, masked mean-pooling
(masked_mean:15), linear projections to a shared latent, L2 normalization,
learned temperature; symmetric InfoNCE when training (model.py:137-139), and
per-pair similarity for reranking AR samples (model.py:133-135, used by
api.py:416-430).

Encoders use the reference's preferred x-transformers configuration
(model.py:53-83: RMSNorm, GLU feed-forward with mult 2, rotary position
embeddings) implemented directly in flax — rotary needs no position tables
and maps cleanly onto fused attention.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttts_tpu.config import CLVPConfig


def rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(x, t):
    """x: (B, T, H, D). Standard rotary over the head dim."""
    d = x.shape[-1]
    freqs = 1.0 / (10000 ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    angles = t[:, None] * freqs[None, :]  # (T, D/2)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (T, D)
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    return x * cos + rotate_half(x) * sin


class RMSNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        # statistics in f32 — a bf16 mean-of-squares loses ~3 bits over 768
        # channels; output returns to the activation dtype
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32**2, axis=-1, keepdims=True)
        return (x32 * jax.lax.rsqrt(var + 1e-8) * scale).astype(x.dtype)


class EncoderLayer(nn.Module):
    dim: int
    heads: int
    ff_mult: int = 2
    dropout: float = 0.1
    dtype: Any = jnp.float32  # activation/matmul dtype; params stay f32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        d, h = self.dim, self.heads
        dk = d // h
        b, t, _ = x.shape

        y = RMSNorm()(x)
        q = nn.Dense(d, use_bias=False, dtype=self.dtype)(y).reshape(b, t, h, dk)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype)(y).reshape(b, t, h, dk)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype)(y).reshape(b, t, h, dk)
        pos = jnp.arange(t, dtype=jnp.float32)
        q = apply_rotary(q, pos)
        k = apply_rotary(k, pos)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dk)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        if self.dropout > 0:
            p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        attn = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
        x = x + nn.Dense(d, use_bias=False, dtype=self.dtype)(attn)

        # GLU feed-forward (ff_glu=True, ff_mult=2)
        y = RMSNorm()(x)
        u = nn.Dense(d * self.ff_mult, use_bias=False, dtype=self.dtype)(y)
        g = nn.Dense(d * self.ff_mult, use_bias=False, dtype=self.dtype)(y)
        y = u * jax.nn.gelu(g, approximate=True)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return x + nn.Dense(d, use_bias=False, dtype=self.dtype)(y)


class CLVPEncoder(nn.Module):
    dim: int
    depth: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        x = x.astype(self.dtype)
        for _ in range(self.depth):
            x = EncoderLayer(self.dim, self.heads, dtype=self.dtype)(
                x, mask, deterministic)
        return RMSNorm()(x)


class PlainEncoderLayer(nn.Module):
    """One layer of the reference's non-xformers Transformer
    (utils/transformer.py:182-226): LayerScale(PreNorm(Attention)) +
    LayerScale(PreNorm(GEGLU FeedForward)), residual after each."""

    dim: int
    heads: int
    dim_head: int = 64
    ff_mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        d, h, dk = self.dim, self.heads, self.dim_head
        inner = h * dk
        b, t, _ = x.shape

        y = nn.LayerNorm(epsilon=1e-5)(x)
        qkv = nn.Dense(3 * inner, use_bias=False)(y)
        q, k, v = jnp.split(qkv.reshape(b, t, 3, h, dk), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q / math.sqrt(dk), k)
        if mask is not None:
            # masked_fill(~mask, -finfo.max) (transformer.py:26-28,164-167)
            scores = jnp.where(mask[:, None, None, :], scores,
                               -jnp.finfo(scores.dtype).max)
        p = jax.nn.softmax(scores, axis=-1)
        if self.dropout > 0:
            p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        attn = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, inner)
        y = nn.Dense(d)(attn)
        gamma_a = self.param("attn_gamma", nn.initializers.constant(0.1), (1, 1, d))
        x = x + y * gamma_a

        y = nn.LayerNorm(epsilon=1e-5)(x)
        y = nn.Dense(d * self.ff_mult * 2)(y)
        val, gate = jnp.split(y, 2, axis=-1)
        y = val * jax.nn.gelu(gate, approximate=False)  # GEGLU, exact gelu
        if self.dropout > 0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(d)(y)
        gamma_f = self.param("ff_gamma", nn.initializers.constant(0.1), (1, 1, d))
        return x + y * gamma_f


class PlainEncoder(nn.Module):
    """utils/transformer.py Transformer(causal=False) — NO final norm."""

    dim: int
    depth: int
    heads: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        for _ in range(self.depth):
            x = PlainEncoderLayer(self.dim, self.heads, self.dim_head)(
                x, mask, deterministic
            )
        return x


def masked_mean(x, mask):
    """(B, T, D), bool (B, T) → (B, D) (clvp/model.py:15-17)."""
    m = mask[..., None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


class CLVP(nn.Module):
    cfg: CLVPConfig
    # activation dtype for the xformers encoders (bf16 under train.amp /
    # TPU serving); pooling, latent projections, L2 norm and the InfoNCE
    # loss always run f32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text, speech_tokens, text_mask=None, voice_mask=None,
                 return_loss: bool = False, train: bool = False):
        c = self.cfg
        b = text.shape[0]
        if text_mask is None:
            text_mask = jnp.ones(text.shape, bool)
        if voice_mask is None:
            voice_mask = jnp.ones(speech_tokens.shape, bool)
        if train and c.text_mask_percentage > 0:
            text_mask = text_mask & (
                jax.random.uniform(self.make_rng("mask"), text.shape) > c.text_mask_percentage
            )
        if train and c.voice_mask_percentage > 0:
            voice_mask = voice_mask & (
                jax.random.uniform(self.make_rng("mask"), speech_tokens.shape)
                > c.voice_mask_percentage
            )

        text_emb = nn.Embed(c.num_text_tokens, c.dim_text)(text)
        speech_emb = nn.Embed(c.num_speech_tokens, c.dim_speech)(speech_tokens)

        if c.use_xformers:
            enc_text = CLVPEncoder(c.dim_text, c.text_enc_depth, c.text_heads,
                                   dtype=self.dtype)(
                text_emb, text_mask, deterministic=not train
            )
            enc_speech = CLVPEncoder(c.dim_speech, c.speech_enc_depth,
                                     c.speech_heads, dtype=self.dtype)(
                speech_emb, voice_mask, deterministic=not train
            )
        else:
            # learned absolute positions (model.py:96-98,117-119; the speech
            # table is vocab-sized in the reference — kept for ported weights)
            tpe = self.param("text_pos_emb", nn.initializers.normal(1.0),
                             (c.text_seq_len, c.dim_text))
            spe = self.param("speech_pos_emb", nn.initializers.normal(1.0),
                             (c.num_speech_tokens, c.dim_speech))
            text_emb = text_emb + tpe[: text.shape[1]][None]
            speech_emb = speech_emb + spe[: speech_tokens.shape[1]][None]
            enc_text = PlainEncoder(c.dim_text, c.text_enc_depth, c.text_heads,
                                    c.dim_head)(text_emb, text_mask,
                                                deterministic=not train)
            enc_speech = PlainEncoder(c.dim_speech, c.speech_enc_depth,
                                      c.speech_heads, c.dim_head)(
                speech_emb, voice_mask, deterministic=not train)

        enc_text = enc_text.astype(jnp.float32)
        enc_speech = enc_speech.astype(jnp.float32)
        text_latent = nn.Dense(c.dim_latent, use_bias=False)(masked_mean(enc_text, text_mask))
        speech_latent = nn.Dense(c.dim_latent, use_bias=False)(
            masked_mean(enc_speech, voice_mask)
        )
        text_latent = text_latent / jnp.linalg.norm(text_latent, axis=-1, keepdims=True)
        speech_latent = speech_latent / jnp.linalg.norm(speech_latent, axis=-1, keepdims=True)

        temp = jnp.exp(self.param("temperature", nn.initializers.ones, ()))

        if not return_loss:
            return jnp.sum(text_latent * speech_latent, axis=-1) * temp

        sim = text_latent @ speech_latent.T * temp
        labels = jnp.arange(b)
        loss = 0.5 * (
            _xent(sim, labels) + _xent(sim.T, labels)
        )
        return loss


def _xent(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

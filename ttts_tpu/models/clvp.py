"""CLVP — contrastive text↔speech-code reranker.

TPU-native rebuild of ttts/clvp/model.py:19-141: dual transformer encoders
over BPE text tokens and speech VQ tokens, masked mean-pooling
(masked_mean:15), linear projections to a shared latent, L2 normalization,
learned temperature; symmetric InfoNCE when training (model.py:137-139), and
per-pair similarity for reranking AR samples (model.py:133-135, used by
api.py:416-430).

Encoders come in BOTH reference flavours (model.py:53-96):

* use_xformers=True — the vendored x-transformers Encoder
  (utils/xtransformers.py) wrapped by CheckpointedXTransformerEncoder →
  ContinuousTransformerWrapper: per layer RMSNorm → Attention (rotary on the
  first max(dim_head//2, 32) head dims of q, k AND v — this x-transformers
  vintage rotates v too, xtransformers.py:409-413; biasless q/k/v, biased
  out) → residual; RMSNorm → GLU feed-forward (one 2×-wide projection,
  value·GELU(gate), ff_mult 2, xtransformers.py:426-436) → residual; then
  the wrapper's final LayerNorm (xtransformers.py:1213,1235). Rebuilt
  exactly in flax so state dicts port and outputs match ≤1e-3.
* use_xformers=False — the plain utils/transformer.py Transformer (the v2
  trainer's default): LayerScale(PreNorm(Attention/GEGLU)), learned
  absolute positions, no final norm.
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


def apply_rotary(x, t, rot_dim: int):
    """x: (B, T, H, D). Rotary over the FIRST `rot_dim` head dims only —
    x-transformers uses rotary_emb_dim = max(dim_head // 2, 32) and leaves
    the rest of the head untouched (xtransformers.py:781,409-413)."""
    xl, xr = x[..., :rot_dim], x[..., rot_dim:]
    freqs = 1.0 / (10000 ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    angles = t[:, None] * freqs[None, :]  # (T, rot/2)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (T, rot)
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    return jnp.concatenate([xl * cos + rotate_half(xl) * sin, xr], axis=-1)


class RMSNorm(nn.Module):
    """xtransformers.py RMSNorm:335-343: x / clamp(‖x‖·dim^-½, eps) · g.
    clamp-min (not +eps inside the sqrt) matches torch exactly."""

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        # statistics in f32 — a bf16 mean-of-squares loses ~3 bits over 768
        # channels; output returns to the activation dtype
        x32 = x.astype(jnp.float32)
        rms = jnp.sqrt(jnp.mean(x32**2, axis=-1, keepdims=True))
        return (x32 / jnp.maximum(rms, 1e-8) * scale).astype(x.dtype)


class EncoderLayer(nn.Module):
    """One x-transformers ('a', 'f') pair (xtransformers.py:1016 Encoder with
    use_rmsnorm, ff_glu, ff_mult=2, rotary_pos_emb; attn/ff dropout 0.1)."""

    dim: int
    heads: int
    # x-transformers' Attention defaults dim_head to 64 INDEPENDENT of
    # dim/heads (xtransformers.py:481-512): inner = heads·64, with to_out
    # mapping inner → dim. The reference CLVP config never overrides it.
    dim_head: int = 64
    ff_mult: int = 2
    dropout: float = 0.1
    dtype: Any = jnp.float32  # activation/matmul dtype; params stay f32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        d, h, dk = self.dim, self.heads, self.dim_head
        inner = h * dk
        rot = max(dk // 2, 32)
        b, t, _ = x.shape

        y = RMSNorm()(x)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype)(y).reshape(b, t, h, dk)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype)(y).reshape(b, t, h, dk)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype)(y).reshape(b, t, h, dk)
        pos = jnp.arange(t, dtype=jnp.float32)
        # this x-transformers vintage rotates v as well (xtransformers.py:411)
        q = apply_rotary(q, pos, rot)
        k = apply_rotary(k, pos, rot)
        v = apply_rotary(v, pos, rot)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dk)
        if mask is not None:
            # input_mask = q_mask × k_mask, filled with -finfo.max
            # (xtransformers.py:633-639,667)
            pair = mask[:, None, :, None] & mask[:, None, None, :]
            scores = jnp.where(pair, scores, -jnp.finfo(jnp.float32).max)
        p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        if self.dropout > 0:
            p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        attn = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, inner)
        x = x + nn.Dense(d, dtype=self.dtype)(attn)  # to_out has a bias

        # GLU feed-forward: ONE 2×-wide biased projection, value·GELU(gate)
        # (exact gelu — torch nn.GELU default), dropout, biased out
        # (xtransformers.py:426-436,440-470)
        y = RMSNorm()(x)
        y = nn.Dense(d * self.ff_mult * 2, dtype=self.dtype)(y)
        u, g = jnp.split(y, 2, axis=-1)
        y = u * jax.nn.gelu(g, approximate=False)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return x + nn.Dense(d, dtype=self.dtype)(y)


class CLVPEncoder(nn.Module):
    """CheckpointedXTransformerEncoder(needs_permute=False) →
    ContinuousTransformerWrapper: rotary layers (no absolute positions since
    has_pos_emb) + the wrapper's trailing LayerNorm (xtransformers.py:1213)."""

    dim: int
    depth: int
    heads: int
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        x = x.astype(self.dtype)
        for _ in range(self.depth):
            x = EncoderLayer(self.dim, self.heads, self.dim_head,
                             dtype=self.dtype)(x, mask, deterministic)
        return nn.LayerNorm(epsilon=1e-5)(x)


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
                                   c.dim_head, dtype=self.dtype)(
                text_emb, text_mask, deterministic=not train
            )
            enc_speech = CLVPEncoder(c.dim_speech, c.speech_enc_depth,
                                     c.speech_heads, c.dim_head,
                                     dtype=self.dtype)(
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

"""Alternative GPT conditioning paths.

The v2 pipeline conditions on prompt VQ codes (api_zh.py:78-86), but the
reference keeps three other conditioning modules that a UnifiedVoice user may
enable; rebuilt here for parity:
  - ConditioningEncoder (ttts/gpt/model.py:203-244): conv mel → attention
    stack → first-token (or mean) embedding.
  - MelEncoder (ttts/gpt/model.py:268-291): conv/ResBlock stack reducing mel
    4× to embedding frames, for use_mel_codes_as_input=False.
  - PerceiverResampler (ttts/gpt/perceiver.py:225-317): 32 learned latents
    cross-attending to variable-length conditioning.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttts_tpu.models.diffusion_net import AttentionBlock, GroupNorm32


class ConditioningEncoder(nn.Module):
    spec_dim: int = 80
    embedding_dim: int = 512
    attn_blocks: int = 6
    num_attn_heads: int = 8
    mean: bool = False

    @nn.compact
    def __call__(self, mel):
        """mel (B, T, spec_dim) → (B, embedding_dim)."""
        h = nn.Conv(self.embedding_dim, (1,))(mel)
        for _ in range(self.attn_blocks):
            h = AttentionBlock(self.embedding_dim, self.num_attn_heads,
                               relative_pos_embeddings=False)(h)
        return jnp.mean(h, axis=1) if self.mean else h[:, 0]


class _MelResBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3,), padding="SAME")(x)
        h = GroupNorm32(self.channels)(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.channels, (3,), padding="SAME")(h)
        h = GroupNorm32(self.channels)(h)
        return jax.nn.relu(x + h)


class MelEncoder(nn.Module):
    """mel (B, T, mel_channels) → (B, T/4, channels) (model.py:268-291)."""

    channels: int
    mel_channels: int = 80
    resblocks_per_reduction: int = 2

    @nn.compact
    def __call__(self, mel):
        c = self.channels
        h = nn.Conv(c // 4, (3,), padding="SAME")(mel)
        for _ in range(self.resblocks_per_reduction):
            h = _MelResBlock(c // 4)(h)
        h = nn.Conv(c // 2, (3,), strides=(2,), padding="SAME")(h)
        h = GroupNorm32(c // 2)(h)
        h = jax.nn.relu(h)
        for _ in range(self.resblocks_per_reduction):
            h = _MelResBlock(c // 2)(h)
        h = nn.Conv(c, (3,), strides=(2,), padding="SAME")(h)
        h = GroupNorm32(c)(h)
        h = jax.nn.relu(h)
        for _ in range(self.resblocks_per_reduction):
            h = _MelResBlock(c)(h)
        return h


class PerceiverResampler(nn.Module):
    """Fixed-size latent bottleneck over variable-length conditioning
    (perceiver.py:225-317): depth× (cross-attn to [x ; latents] + FF)."""

    dim: int
    depth: int = 2
    num_latents: int = 32
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        b = x.shape[0]
        latents = self.param("latents", nn.initializers.normal(0.02),
                             (self.num_latents, self.dim))
        lat = jnp.tile(latents[None], (b, 1, 1))
        inner = self.dim_head * self.heads
        for _ in range(self.depth):
            q_in = nn.LayerNorm()(lat)
            kv_in = nn.LayerNorm()(jnp.concatenate([x, lat], axis=1))
            q = nn.Dense(inner, use_bias=False)(q_in)
            k = nn.Dense(inner, use_bias=False)(kv_in)
            v = nn.Dense(inner, use_bias=False)(kv_in)
            q = q.reshape(b, -1, self.heads, self.dim_head)
            k = k.reshape(b, -1, self.heads, self.dim_head)
            v = v.reshape(b, -1, self.heads, self.dim_head)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.dim_head)
            if mask is not None:
                m = jnp.concatenate(
                    [mask, jnp.ones((b, lat.shape[1]), bool)], axis=1
                )
                scores = jnp.where(m[:, None, None, :], scores, -1e9)
            p = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, -1, inner)
            lat = lat + nn.Dense(self.dim, use_bias=False)(attn)
            ff_in = nn.LayerNorm()(lat)
            ff = nn.Dense(self.dim * self.ff_mult)(ff_in)
            ff = nn.Dense(self.dim)(jax.nn.gelu(ff))
            lat = lat + ff
        return nn.LayerNorm()(lat)

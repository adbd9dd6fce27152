"""Audio quality / noise classifier for dataset filtering.

TPU-native rebuild of ttts/classifier/model.py:82-152
(AudioMiniEncoderWithClassifierHead): conv stem → depth× (resnet_blocks×
ResBlock + strided conv Downsample) → GroupNorm/SiLU/1×1 to embedding_dim →
attn_blocks× AttentionBlock → take frame 0 → linear head. Used offline to
produce `noise_files.txt` for prepare/filter_noise_and_other_spk.py:23.

Input is a mel spectrogram (B, T, spec_dim) channels-last.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttts_tpu.config import ClassifierConfig
from ttts_tpu.models.diffusion_net import AttentionBlock, GroupNorm32


class ClassifierResBlock(nn.Module):
    channels: int
    dropout: float
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = jax.nn.silu(GroupNorm32(self.channels)(x))
        h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME")(h)
        h = jax.nn.silu(GroupNorm32(self.channels)(h))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    kernel_init=nn.initializers.zeros)(h)
        return x + h


class AudioMiniEncoder(nn.Module):
    cfg: ClassifierConfig

    @nn.compact
    def __call__(self, mel, deterministic=True):
        c = self.cfg
        h = nn.Conv(c.base_channels, (3,), padding="SAME")(mel)
        ch = c.base_channels
        for _ in range(c.depth):
            for _ in range(c.resnet_blocks):
                h = ClassifierResBlock(ch, c.dropout, c.kernel_size)(h, deterministic)
            ch *= 2
            h = nn.Conv(ch, (3,), strides=(c.downsample_factor,), padding="SAME")(h)
        h = jax.nn.silu(GroupNorm32(ch)(h))
        h = nn.Dense(c.embedding_dim)(h)
        for _ in range(c.attn_blocks):
            h = AttentionBlock(c.embedding_dim, c.num_attn_heads,
                               relative_pos_embeddings=False)(h)
        return h[:, 0]


class AudioMiniEncoderWithClassifierHead(nn.Module):
    cfg: ClassifierConfig

    @nn.compact
    def __call__(self, mel, labels: Optional[jax.Array] = None, deterministic=True):
        c = self.cfg
        h = AudioMiniEncoder(c)(mel, deterministic)
        logits = nn.Dense(c.classes)(h)
        if labels is None:
            return logits
        oh = jax.nn.one_hot(labels, c.classes)
        if c.distribute_zero_label:
            # soften label 0 by 20% mass spread over other classes (model.py:140-147)
            extra = jnp.full_like(oh, 0.2 / (c.classes - 1)).at[:, 0].set(-0.2)
            oh = oh + extra * (labels == 0)[:, None]
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.sum(oh * logp, axis=-1))

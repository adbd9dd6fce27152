"""DiffusionTts — the Tortoise-v1 diffusion decoder.

TPU-native rebuild of ttts/diffusion/model.py:134-330, the network behind the
legacy api.py English pipeline: same flat DiffusionLayer trunk as
AA_diffusion, but conditioned by
  - either a sequence of VQ codes (code_embedding + 3 AttentionBlocks,
    model.py:172-177) or an AR latent (latent_conditioner, model.py:179-185),
  - plus a conditioning mel processed by a strided `contextual_embedder`
    whose mean-pooled output splits into a (scale, shift) FiLM pair applied
    to the code embedding (model.py:186-193, 239-245),
  - classifier-free dropout via a learned unconditioned embedding,
  - an auxiliary mel_head predicting the mel directly from the conditioning
    (the v1 trainer's auxiliary loss, model.py:255-259).

Channels-last; layer-drop is branchless stochastic depth (no DDP
unused-param tricks needed under jit).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttts_tpu.models.diffusion_net import (
    AttentionBlock,
    GroupNorm32,
    ScaleShiftResBlock,
    DiffusionLayer,
    _nearest_interp,
    timestep_embedding,
)


class DiffusionTts(nn.Module):
    model_channels: int = 512
    num_layers: int = 8
    in_channels: int = 100
    in_latent_channels: int = 512
    in_tokens: int = 8193
    out_channels: int = 200
    dropout: float = 0.0
    num_heads: int = 16
    layer_drop: float = 0.1
    unconditioned_percentage: float = 0.1

    def setup(self):
        ch = self.model_channels
        self.inp_block = nn.Conv(ch, (3,), padding="SAME")
        self.time_embed = [nn.Dense(ch), nn.Dense(ch)]
        self.code_embedding = nn.Embed(self.in_tokens, ch)
        self.code_converter = [AttentionBlock(ch, self.num_heads) for _ in range(3)]
        self.code_norm = GroupNorm32(ch)
        self.latent_conditioner_conv = nn.Conv(ch, (3,), padding="SAME")
        self.latent_conditioner_attn = [
            AttentionBlock(ch, self.num_heads) for _ in range(4)
        ]
        self.contextual_convs = [
            nn.Conv(ch, (3,), strides=(2,), padding="SAME"),
            nn.Conv(2 * ch, (3,), strides=(2,), padding="SAME"),
        ]
        self.contextual_attn = [AttentionBlock(2 * ch, self.num_heads) for _ in range(5)]
        self.unconditioned_embedding = self.param(
            "unconditioned_embedding", nn.initializers.normal(1.0), (1, 1, ch)
        )
        self.conditioning_timestep_integrator = [
            DiffusionLayer(ch, self.num_heads, self.dropout) for _ in range(3)
        ]
        self.integrating_conv = nn.Dense(ch)
        self.mel_head = nn.Conv(self.in_channels, (3,), padding="SAME")
        self.layers = [
            DiffusionLayer(ch, self.num_heads, self.dropout) for _ in range(self.num_layers)
        ] + [ScaleShiftResBlock(ch, ch, ch, self.dropout) for _ in range(3)]
        self.out_norm = GroupNorm32(ch)
        self.out_conv = nn.Conv(self.out_channels, (3,), padding="SAME")

    def get_conditioning(self, conditioning_mel):
        """conditioning mel (B, T, in_channels) → (B, 2*model_channels)
        (contextual_embedder + mean pool, model.py:222-230)."""
        h = self.contextual_convs[0](conditioning_mel)
        h = self.contextual_convs[1](h)
        for blk in self.contextual_attn:
            h = blk(h)
        return jnp.mean(h, axis=1)

    def timestep_independent(self, aligned_conditioning, conditioning_latent,
                             expected_seq_len: int, return_code_pred: bool = False,
                             train: bool = False, uncond_key=None):
        """aligned_conditioning: int codes (B, L) or float latent (B, L, C);
        conditioning_latent: (B, 2*ch) from get_conditioning (or a raw
        conditioning mel, auto-encoded)."""
        if conditioning_latent.ndim > 2:
            conditioning_latent = self.get_conditioning(conditioning_latent)
        cond_scale, cond_shift = jnp.split(conditioning_latent, 2, axis=1)

        if jnp.issubdtype(aligned_conditioning.dtype, jnp.floating):
            code_emb = self.latent_conditioner_conv(aligned_conditioning)
            for blk in self.latent_conditioner_attn:
                code_emb = blk(code_emb)
        else:
            code_emb = self.code_embedding(aligned_conditioning)
            for blk in self.code_converter:
                code_emb = blk(code_emb)
        code_emb = (
            self.code_norm(code_emb) * (1 + cond_scale[:, None, :])
            + cond_shift[:, None, :]
        )

        uncond_mask = None
        if train and uncond_key is not None and self.unconditioned_percentage > 0:
            b = code_emb.shape[0]
            uncond_mask = (
                jax.random.uniform(uncond_key, (b, 1, 1)) < self.unconditioned_percentage
            )
            code_emb = jnp.where(uncond_mask, self.unconditioned_embedding, code_emb)
        expanded = _nearest_interp(code_emb, expected_seq_len)
        if not return_code_pred:
            return expanded
        mel_pred = self.mel_head(expanded)
        if uncond_mask is not None:
            mel_pred = mel_pred * (~uncond_mask)
        return expanded, mel_pred

    def trunk(self, x, timesteps, code_emb, train: bool = False, layerdrop_key=None):
        ch = self.model_channels
        t_emb = timestep_embedding(timesteps, ch)
        t_emb = self.time_embed[1](jax.nn.silu(self.time_embed[0](t_emb)))
        h = code_emb
        for m in self.conditioning_timestep_integrator:
            h = m(h, t_emb, deterministic=not train)
        x = self.inp_block(x)
        x = self.integrating_conv(jnp.concatenate([x, h], axis=-1))
        n = len(self.layers)
        for i, lyr in enumerate(self.layers):
            y = lyr(x, t_emb, deterministic=not train)
            if train and self.layer_drop > 0 and layerdrop_key is not None and 0 < i < n - 1:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(layerdrop_key, i), 1.0 - self.layer_drop
                )
                x = jnp.where(keep, y, x)
            else:
                x = y
        x = jax.nn.silu(self.out_norm(x.astype(jnp.float32)))
        return self.out_conv(x)

    def _touch_all_branches(self):
        """Create params for every conditioning branch at init time (flax only
        materializes params for traced paths; the model has code/latent/mel
        alternatives)."""
        ch = self.model_channels
        h = self.code_embedding(jnp.zeros((1, 8), jnp.int32))
        for blk in self.code_converter:
            h = blk(h)
        h = self.latent_conditioner_conv(jnp.zeros((1, 8, self.in_latent_channels)))
        for blk in self.latent_conditioner_attn:
            h = blk(h)
        self.get_conditioning(jnp.zeros((1, 8, self.in_channels)))
        self.mel_head(jnp.zeros((1, 8, ch)))

    def __call__(self, x, timesteps, aligned_conditioning=None,
                 conditioning_latent=None, precomputed_aligned_embeddings=None,
                 conditioning_free: bool = False, return_code_pred: bool = False,
                 train: bool = False):
        if self.is_initializing():
            self._touch_all_branches()
        mel_pred = None
        if conditioning_free:
            code_emb = jnp.tile(self.unconditioned_embedding, (x.shape[0], x.shape[1], 1))
        elif precomputed_aligned_embeddings is not None:
            code_emb = precomputed_aligned_embeddings
        else:
            uncond_key = self.make_rng("uncond") if train else None
            res = self.timestep_independent(
                aligned_conditioning, conditioning_latent, x.shape[1],
                return_code_pred, train=train, uncond_key=uncond_key,
            )
            if return_code_pred:
                code_emb, mel_pred = res
            else:
                code_emb = res
        ld_key = self.make_rng("layerdrop") if train and self.layer_drop > 0 else None
        out = self.trunk(x, timesteps, code_emb, train=train, layerdrop_key=ld_key)
        if return_code_pred:
            return out, mel_pred
        return out

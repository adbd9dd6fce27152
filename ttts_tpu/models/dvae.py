"""Legacy Tortoise discrete VAE (reference ttts/vqvae/dvae.py).

The v1-era mel tokenizer: conv stride-2 encoder stack → EMA vector
quantization → transposed-conv decoder (DiscreteVAE, dvae.py:208-400). The
reference's Quantize (dvae.py:60-140) carries the repo's only explicit
collective — `distributed.all_reduce` of the EMA statistics
(dvae.py:116-118); here that's inherent: the EMA update in
ttts_tpu/models/quantize.py has global semantics under pjit.

1D (audio/mel) variant only; the reference's 2D image path was never used in
the TTS pipeline.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttts_tpu.models.blocks import Conv1d, ConvTranspose1d
from ttts_tpu.models.vqvae import ResidualVQ


class _ResBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3,), padding="SAME")(x)
        h = jax.nn.relu(h)
        h = nn.Conv(self.channels, (3,), padding="SAME")(h)
        return jax.nn.relu(x + h)


class _Encoder(nn.Module):
    hidden_dim: int
    num_layers: int
    num_resnet_blocks: int
    codebook_dim: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, mel):
        pad = (self.kernel_size - 1) // 2
        h = mel
        ch = [self.hidden_dim * 2**i for i in range(self.num_layers)]
        for c in ch:
            h = Conv1d(c, self.kernel_size, stride=self.stride, padding=(pad, pad))(h)
            h = jax.nn.relu(h)
        for _ in range(self.num_resnet_blocks):
            h = _ResBlock(ch[-1])(h)
        return Conv1d(self.codebook_dim, 1, padding=(0, 0))(h)


class _Decoder(nn.Module):
    hidden_dim: int
    num_layers: int
    num_resnet_blocks: int
    out_channels: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, q):
        pad = (self.kernel_size - 1) // 2
        ch = list(reversed([self.hidden_dim * 2**i for i in range(self.num_layers)]))
        h = q
        if self.num_resnet_blocks > 0:
            h = Conv1d(ch[0], 1, padding=(0, 0))(h)
            for _ in range(self.num_resnet_blocks):
                h = _ResBlock(ch[0])(h)
        for c in ch:
            h = ConvTranspose1d(c, self.kernel_size, self.stride, torch_padding=pad)(h)
            h = jax.nn.relu(h)
        return Conv1d(self.out_channels, 1, padding=(0, 0))(h)


class DiscreteVAE(nn.Module):
    num_tokens: int = 512
    codebook_dim: int = 512
    channels: int = 80  # input mel bins
    out_channels: int = 80
    hidden_dim: int = 64
    num_layers: int = 3
    num_resnet_blocks: int = 0
    kernel_size: int = 4
    stride: int = 2

    def setup(self):
        self.encoder = _Encoder(self.hidden_dim, self.num_layers,
                                self.num_resnet_blocks, self.codebook_dim,
                                self.kernel_size, self.stride)
        self.decoder = _Decoder(self.hidden_dim, self.num_layers,
                                self.num_resnet_blocks, self.out_channels,
                                self.kernel_size, self.stride)
        self.quantizer = ResidualVQ(dim=self.codebook_dim, n_q=1,
                                    bins=self.num_tokens)

    def __call__(self, mel, train: bool = False):
        """mel (B, T, channels) → (recon_loss, commit_loss, recon)."""
        h = self.encoder(mel)
        q, codes, commit = self.quantizer(h, train=train)
        out = self.decoder(q)
        t = min(out.shape[1], mel.shape[1])
        recon = jnp.mean((out[:, :t] - mel[:, :t]) ** 2)
        return recon, commit, out

    def get_codebook_indices(self, mel):
        """mel → discrete codes (B, T/2^L) (dvae.py get_codebook_indices)."""
        h = self.encoder(mel)
        return self.quantizer.encode(h)[0]

    def decode_codes(self, codes):
        """codes (B, T) → reconstructed mel (quantizer.decode expects
        (n_q, B, T))."""
        q = self.quantizer.decode(codes[None])
        return self.decoder(q)

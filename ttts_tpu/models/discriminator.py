"""GAN discriminators (reference ttts/vqvae/vq2.py:418-552).

MultiPeriodDiscriminator = DiscriminatorS + DiscriminatorP(2,3,5,7,11).
Inputs are waveforms (B, T, 1), channels-last; DiscriminatorP folds time into
(B, T/p, p, 1) and runs NHWC 2D convs with (k,1) kernels — maps directly onto
XLA's convolution tiling.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttts_tpu.models.blocks import LRELU_SLOPE, Conv1d


class DiscriminatorP(nn.Module):
    """Period discriminator (vq2.py:418-497)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    channels: Tuple[int, ...] = (32, 128, 512, 1024)

    @nn.compact
    def __call__(self, x):
        b, t, _ = x.shape
        p = self.period
        if t % p != 0:
            pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
            t = t + pad
        x = x.reshape(b, t // p, p, 1)

        fmap = []
        kp = (self.kernel_size - 1) // 2
        for ch in self.channels:
            x = nn.WeightNorm(
                nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                        padding=[(kp, kp), (0, 0)])
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.WeightNorm(
            nn.Conv(self.channels[-1], (self.kernel_size, 1), strides=(1, 1),
                    padding=[(kp, kp), (0, 0)])
        )(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = nn.WeightNorm(nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)]))(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator (vq2.py:497-525)."""

    specs: Tuple[Tuple[int, int, int, int], ...] = (
        (16, 15, 1, 1),
        (64, 41, 4, 4),
        (256, 41, 4, 16),
        (1024, 41, 4, 64),
        (1024, 41, 4, 256),
        (1024, 5, 1, 1),
    )  # (channels, kernel, stride, groups) per layer

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        fmap = []
        for ch, k, s, g in self.specs:
            x = Conv1d(ch, k, stride=s, groups=g,
                       padding=((k - 1) // 2, (k - 1) // 2), weight_norm=True)(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv1d(1, 3, weight_norm=True)(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """DiscriminatorS + periods (2,3,5,7,11) (vq2.py:527-552). Returns
    (scores_real, scores_gen, fmaps_real, fmaps_gen)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    p_channels: Tuple[int, ...] = (32, 128, 512, 1024)
    s_specs: Tuple[Tuple[int, int, int, int], ...] = DiscriminatorS.specs

    @nn.compact
    def __call__(self, y, y_hat):
        discs = [DiscriminatorS(self.s_specs)] + [
            DiscriminatorP(p, channels=self.p_channels) for p in self.periods
        ]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in discs:
            s_r, f_r = d(y)
            s_g, f_g = d(y_hat)
            y_d_rs.append(s_r)
            y_d_gs.append(s_g)
            fmap_rs.append(f_r)
            fmap_gs.append(f_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs

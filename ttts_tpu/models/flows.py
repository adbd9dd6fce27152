"""Normalizing-flow module zoo (reference ttts/vqvae/modules.py:366-937).

Completes the VITS flow family beyond the ResidualCouplingLayer used by the
codec: Log / ElementwiseAffine flows, DDSConv (dilated depth-separable stack),
ConvFlow (piecewise rational-quadratic spline coupling), ActNorm and
InvConvNear (Glow-style), all channels-last with (B, T, C) tensors and
(B, T, 1) masks. Forward returns (y, logdet); reverse returns y.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttts_tpu.models.blocks import Conv1d


class LogFlow(nn.Module):
    """y = log(clamp(x)) (modules.Log:366-374)."""

    def __call__(self, x, x_mask, reverse: bool = False):
        if not reverse:
            y = jnp.log(jnp.maximum(x, 1e-5)) * x_mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * x_mask


class ElementwiseAffine(nn.Module):
    """y = m + exp(logs)·x (modules.ElementwiseAffine:387-402)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack (modules.DDSConv:87-133)."""

    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic=True):
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size**i
            y = Conv1d(self.channels, self.kernel_size, dilation=dilation,
                       groups=self.channels)(x * x_mask)
            y = nn.LayerNorm()(y)
            y = jax.nn.gelu(y)
            y = Conv1d(self.channels, 1, padding=(0, 0))(y)
            y = nn.LayerNorm()(y)
            y = jax.nn.gelu(y)
            if self.p_dropout > 0:
                y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = x + y
        return x * x_mask


# ---------------------------------------------------------------------------
# Piecewise rational-quadratic spline (VITS transforms.py semantics)
# ---------------------------------------------------------------------------

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def rational_quadratic_spline(
    inputs, unnormalized_widths, unnormalized_heights, unnormalized_derivatives,
    inverse: bool = False, tail_bound: float = 5.0,
):
    """Unconstrained ('linear' tails) monotone RQ spline.

    inputs: (...,); unnormalized_*: (..., K) / (..., K+1 after tail padding).
    Returns (outputs, logabsdet)."""
    num_bins = unnormalized_widths.shape[-1]

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # linear tails: pad derivatives so boundary slope is 1
    constant = math.log(math.exp(1 - DEFAULT_MIN_DERIVATIVE) - 1)
    unnormalized_derivatives = jnp.pad(
        unnormalized_derivatives, [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)],
        constant_values=constant,
    )

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = DEFAULT_MIN_BIN_WIDTH + (1 - DEFAULT_MIN_BIN_WIDTH * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (2 * tail_bound) * cumwidths - tail_bound
    cumwidths = cumwidths.at[..., 0].set(-tail_bound).at[..., -1].set(tail_bound)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = DEFAULT_MIN_DERIVATIVE + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = DEFAULT_MIN_BIN_HEIGHT + (1 - DEFAULT_MIN_BIN_HEIGHT * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (2 * tail_bound) * cumheights - tail_bound
    cumheights = cumheights.at[..., 0].set(-tail_bound).at[..., -1].set(tail_bound)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    x_in = jnp.clip(inputs, -tail_bound, tail_bound)
    bins = cumheights if inverse else cumwidths
    idx = jnp.sum((x_in[..., None] >= bins[..., :-1]).astype(jnp.int32), axis=-1) - 1
    idx = jnp.clip(idx, 0, num_bins - 1)

    def take(t):
        return jnp.take_along_axis(t, idx[..., None], axis=-1)[..., 0]

    in_cumwidths = take(cumwidths[..., :-1])
    in_widths = take(widths)
    in_cumheights = take(cumheights[..., :-1])
    in_heights = take(heights)
    delta = in_heights / in_widths
    d0 = take(derivatives[..., :-1])
    d1 = take(derivatives[..., 1:])

    if inverse:
        a = (x_in - in_cumheights) * (d0 + d1 - 2 * delta) + in_heights * (delta - d0)
        b = in_heights * d0 - (x_in - in_cumheights) * (d0 + d1 - 2 * delta)
        c = -delta * (x_in - in_cumheights)
        disc = b**2 - 4 * a * c
        root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
        outputs = root * in_widths + in_cumwidths
        theta_one_minus_theta = root * (1 - root)
        denom = delta + (d0 + d1 - 2 * delta) * theta_one_minus_theta
        deriv_num = delta**2 * (
            d1 * root**2 + 2 * delta * theta_one_minus_theta + d0 * (1 - root) ** 2
        )
        logabsdet = -(jnp.log(deriv_num) - 2 * jnp.log(denom))
    else:
        theta = (x_in - in_cumwidths) / in_widths
        theta_one_minus_theta = theta * (1 - theta)
        numerator = in_heights * (delta * theta**2 + d0 * theta_one_minus_theta)
        denom = delta + (d0 + d1 - 2 * delta) * theta_one_minus_theta
        outputs = in_cumheights + numerator / denom
        deriv_num = delta**2 * (
            d1 * theta**2 + 2 * delta * theta_one_minus_theta + d0 * (1 - theta) ** 2
        )
        logabsdet = jnp.log(deriv_num) - 2 * jnp.log(denom)

    outputs = jnp.where(inside, outputs, inputs)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return outputs, logabsdet


class ConvFlow(nn.Module):
    """Spline coupling layer (modules.ConvFlow:462-537)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.in_channels // 2
        x0, x1 = jnp.split(x, 2, axis=-1)
        h = Conv1d(self.filter_channels, 1, padding=(0, 0))(x0)
        h = DDSConv(self.filter_channels, self.kernel_size, self.n_layers)(h, x_mask, g=g)
        h = nn.Dense(half * (3 * self.num_bins - 1),
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(h) * x_mask
        b, t, _ = x0.shape
        h = h.reshape(b, t, half, 3 * self.num_bins - 1)
        scale = 1.0 / math.sqrt(self.filter_channels)
        uw = h[..., : self.num_bins] * scale
        uh = h[..., self.num_bins : 2 * self.num_bins] * scale
        ud = h[..., 2 * self.num_bins :]
        x1_new, logabsdet = rational_quadratic_spline(
            x1, uw, uh, ud, inverse=reverse, tail_bound=self.tail_bound
        )
        y = jnp.concatenate([x0, x1_new * x_mask], axis=-1)
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        if not reverse:
            return y, logdet
        return y


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init left to the caller
    (modules.ActNorm:818-867)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask=None, reverse: bool = False):
        if x_mask is None:
            x_mask = jnp.ones(x.shape[:2] + (1,), x.dtype)
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        x_len = jnp.sum(x_mask, axis=(1, 2))
        if reverse:
            return (x - bias) * jnp.exp(-logs) * x_mask
        y = (bias + jnp.exp(logs) * x) * x_mask
        logdet = jnp.sum(logs) * x_len
        return y, logdet


class InvConvNear(nn.Module):
    """Invertible 1×1 conv over channel groups (modules.InvConvNear:869-937)."""

    channels: int
    n_split: int = 4

    @nn.compact
    def __call__(self, x, x_mask=None, reverse: bool = False):
        assert self.channels % self.n_split == 0
        b, t, c = x.shape
        if x_mask is None:
            x_mask = jnp.ones((b, t, 1), x.dtype)
            x_len = jnp.full((b,), t, jnp.float32)
        else:
            x_len = jnp.sum(x_mask, axis=(1, 2))

        def init_w(key):
            w = jax.random.orthogonal(key, self.n_split)
            det = jnp.linalg.det(w)
            # ensure det > 0 (reference flips a column sign)
            w = w.at[:, 0].multiply(jnp.sign(det))
            return w

        weight = self.param("weight", init_w)

        ns = self.n_split
        # (B, T, C) → (B, T, C//ns, ns) grouped like the reference's
        # view(b, 2, c//ns, ns//2, t) interleave
        xg = x.reshape(b, t, 2, ns // 2, c // ns)
        xg = jnp.transpose(xg, (0, 1, 2, 4, 3)).reshape(b, t, c // ns, ns)

        if reverse:
            w = jnp.linalg.inv(weight)
        else:
            w = weight
        z = jnp.einsum("btgs,sk->btgk", xg, w.T)
        z = z.reshape(b, t, 2, c // ns, ns // 2)
        z = jnp.transpose(z, (0, 1, 2, 4, 3)).reshape(b, t, c) * x_mask
        if reverse:
            return z
        logdet = jnp.linalg.slogdet(weight)[1] * (c / ns) * x_len
        return z, logdet

"""Vocos vocoder — ConvNeXt backbone + ISTFT head.

TPU-native rebuild of ttts/vocoder/{vocos.py,models.py,heads.py,modules.py}:
`Vocos.decode` (vocos.py:97) maps a 100-bin log-mel (B, T, 100) to a 24 kHz
waveform: embed conv(7) → LayerNorm → 8× ConvNeXtBlock (depthwise conv(7) →
LN → pointwise MLP ×3 expansion → layer scale → residual, modules.py:8-62) →
final LN → ISTFTHead (heads.py:24-67: linear to n_fft+2 = [log-mag; phase],
mag=exp clipped at 1e2, complex mag·e^{iφ}, overlap-add ISTFT).

The whole decode is one jit program; the ISTFT rides XLA's irfft + a
scatter-add overlap-add (ttts_tpu/ops/stft.py istft). ConvNeXt blocks are
channels-last throughout — no transposes, XLA fuses LN/MLP into the convs.

Weight porting from the released `charactr/vocos-mel-24khz` torch checkpoint
is supported via `port_torch_state_dict` (the reference loads it with
Vocos.from_pretrained, ttts/diffusion/train.py:105).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.config import VocosConfig
from ttts_tpu.ops.stft import istft


class ConvNeXtBlock(nn.Module):
    dim: int
    intermediate_dim: int
    layer_scale_init_value: float

    @nn.compact
    def __call__(self, x):
        residual = x
        x = nn.Conv(self.dim, (7,), padding="SAME", feature_group_count=self.dim)(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = nn.Dense(self.intermediate_dim)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim)(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init_value), (self.dim,)
        )
        return residual + gamma * x


class VocosBackbone(nn.Module):
    cfg: VocosConfig

    @nn.compact
    def __call__(self, mel):
        c = self.cfg
        x = nn.Conv(c.dim, (7,), padding="SAME")(mel)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        scale = 1.0 / c.num_layers
        for _ in range(c.num_layers):
            x = ConvNeXtBlock(c.dim, c.intermediate_dim, scale)(x)
        return nn.LayerNorm(epsilon=1e-6)(x)


class ISTFTHead(nn.Module):
    n_fft: int
    hop_length: int
    padding: str = "center"

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.n_fft + 2)(x)  # (B, T, n_fft+2)
        mag, p = jnp.split(h, 2, axis=-1)
        mag = jnp.minimum(jnp.exp(mag), 1e2)
        spec = (mag * jax.lax.complex(jnp.cos(p), jnp.sin(p))).swapaxes(1, 2)
        return istft(spec, self.n_fft, self.hop_length, self.n_fft, padding=self.padding)


class VocosResBlock1(nn.Module):
    """HiFi-GAN-style dilated ResBlock with layer scale, no upsampling
    (ttts/vocoder/modules.py ResBlock1:89-190)."""

    dim: int
    kernel_size: int = 3
    dilations: tuple = (1, 3, 5)
    layer_scale_init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        for d in self.dilations:
            xt = nn.leaky_relu(x, 0.1)
            xt = nn.WeightNorm(nn.Conv(self.dim, (self.kernel_size,),
                                       kernel_dilation=(d,), padding="SAME"))(xt)
            xt = nn.leaky_relu(xt, 0.1)
            xt = nn.WeightNorm(nn.Conv(self.dim, (self.kernel_size,), padding="SAME"))(xt)
            gamma = self.param(f"gamma_{d}", nn.initializers.constant(
                self.layer_scale_init_value), (self.dim,))
            x = x + gamma * xt
        return x


class VocosResNetBackbone(nn.Module):
    """ResBlock backbone variant (ttts/vocoder/models.py:93-118)."""

    cfg: VocosConfig
    num_blocks: int = 3

    @nn.compact
    def __call__(self, mel):
        c = self.cfg
        x = nn.WeightNorm(nn.Conv(c.dim, (3,), padding="SAME"))(mel)
        scale = 1.0 / self.num_blocks / 3
        for _ in range(self.num_blocks):
            x = VocosResBlock1(c.dim, layer_scale_init_value=scale)(x)
        return x


def _symexp(x):
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


class IMDCTSymExpHead(nn.Module):
    """MDCT-coefficient head with symmetric-exp output
    (ttts/vocoder/heads.py IMDCTSymExpHead:70-120)."""

    mdct_frame_len: int
    padding: str = "same"
    clip_audio: bool = False

    @nn.compact
    def __call__(self, x):
        from ttts_tpu.ops.mdct import imdct

        coeffs = _symexp(nn.Dense(self.mdct_frame_len // 2)(x))
        coeffs = jnp.clip(coeffs, -1e2, 1e2)
        audio = imdct(coeffs, self.mdct_frame_len, self.padding)
        return jnp.clip(audio, -1.0, 1.0) if self.clip_audio else audio


class IMDCTCosHead(nn.Module):
    """MDCT head parameterized as exp(m)·cos(φ)
    (ttts/vocoder/heads.py IMDCTCosHead)."""

    mdct_frame_len: int
    padding: str = "same"
    clip_audio: bool = False

    @nn.compact
    def __call__(self, x):
        from ttts_tpu.ops.mdct import imdct

        h = nn.Dense(self.mdct_frame_len)(x)
        m, p = jnp.split(h, 2, axis=-1)
        coeffs = jnp.minimum(jnp.exp(m), 1e2) * jnp.cos(p)
        audio = imdct(coeffs, self.mdct_frame_len, self.padding)
        return jnp.clip(audio, -1.0, 1.0) if self.clip_audio else audio


class Vocos(nn.Module):
    """feature-less decode path: log-mel (B, T, n_mels) → wav (B, T*hop)."""

    cfg: VocosConfig

    @nn.compact
    def __call__(self, mel):
        x = VocosBackbone(self.cfg)(mel)
        return ISTFTHead(self.cfg.n_fft, self.cfg.hop_length, self.cfg.padding)(x)

    decode = __call__


def port_torch_state_dict(params, state_dict: dict) -> dict:
    """Map a `charactr/vocos-mel-24khz` torch state dict onto our params.

    Keys expected: backbone.embed.{weight,bias}, backbone.norm.*,
    backbone.convnext.{i}.{dwconv,norm,pwconv1,pwconv2,gamma},
    backbone.final_layer_norm.*, head.out.{weight,bias}.
    torch conv weight (out, in/groups, k) → flax (k, in/groups, out);
    linear (out, in) → (in, out).
    """
    import copy

    new = jax.tree_util.tree_map(np.asarray, params)
    p = new["params"]
    bb = p["VocosBackbone_0"]

    def conv_w(w):
        return np.transpose(w, (2, 1, 0))

    def lin_w(w):
        return np.transpose(w, (1, 0))

    g = lambda k: np.asarray(state_dict[k])
    bb["Conv_0"]["kernel"] = conv_w(g("backbone.embed.weight"))
    bb["Conv_0"]["bias"] = g("backbone.embed.bias")
    bb["LayerNorm_0"]["scale"] = g("backbone.norm.weight")
    bb["LayerNorm_0"]["bias"] = g("backbone.norm.bias")
    n_layers = sum(1 for k in bb if k.startswith("ConvNeXtBlock_"))
    for i in range(n_layers):
        blk = bb[f"ConvNeXtBlock_{i}"]
        pre = f"backbone.convnext.{i}."
        blk["Conv_0"]["kernel"] = conv_w(g(pre + "dwconv.weight"))
        blk["Conv_0"]["bias"] = g(pre + "dwconv.bias")
        blk["LayerNorm_0"]["scale"] = g(pre + "norm.weight")
        blk["LayerNorm_0"]["bias"] = g(pre + "norm.bias")
        blk["Dense_0"]["kernel"] = lin_w(g(pre + "pwconv1.weight"))
        blk["Dense_0"]["bias"] = g(pre + "pwconv1.bias")
        blk["Dense_1"]["kernel"] = lin_w(g(pre + "pwconv2.weight"))
        blk["Dense_1"]["bias"] = g(pre + "pwconv2.bias")
        blk["gamma"] = g(pre + "gamma")
    bb["LayerNorm_1"]["scale"] = g("backbone.final_layer_norm.weight")
    bb["LayerNorm_1"]["bias"] = g("backbone.final_layer_norm.bias")
    head = p["ISTFTHead_0"]
    head["Dense_0"]["kernel"] = lin_w(g("head.out.weight"))
    head["Dense_0"]["bias"] = g("head.out.bias")
    return jax.tree_util.tree_map(jnp.asarray, new)

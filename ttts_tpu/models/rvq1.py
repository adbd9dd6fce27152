"""RVQ1 — the inference-side codec of the reference's released pipeline.

TPU-native rebuild of ttts/vqvae/rvq1.py:234-373 (the model
infer_utils.load_model('vqvae') constructs, and whose extract_code produces
the `.vq` training sidecars via prepare/extract_vq.py:20):

  spec ─ ref_enc (strided conv + perceiver RefEncoder, rvq1.py:290) → ge
       ─ semantic_enc (spec→HuBERT space, L1-distilled, rvq1.py:305)
       ─ stride-2 semantic_proj (rvq1.py:249) → RVQ (n_q=1, bins=1024)
       ─ 2× nearest upsample → text_enc (AttentionBlocks + MRTE over 256
         learned latents, rvq1.py:84-123) → (m_p, logs_p)
  spec ─ spec_enc posterior → z ─ flow → z_p ;  HiFi-GAN dec on z slices.

The reference's broken decode (rvq1.py:353-366 unpacks 4 values from a
3-tuple) is implemented with its intended semantics. Channels-last.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttts_tpu.models.blocks import Conv1d, WN
from ttts_tpu.models.diffusion_net import AttentionBlock
from ttts_tpu.models.vqvae import (
    Generator,
    ResidualCouplingBlock,
    ResidualVQ,
    rand_slice_segments,
)


class RefEncoder(nn.Module):
    """Perceiver pooling over the spec embedding (rvq1.py:20-45)."""

    ref_dim: int
    out_dim: int
    num_latents: int = 16
    num_heads: int = 16

    @nn.compact
    def __call__(self, x):
        import math

        b = x.shape[0]
        latents = self.param("latents", nn.initializers.normal(0.02),
                             (self.num_latents, self.ref_dim))
        lat = jnp.tile(latents[None], (b, 1, 1))
        h, dk = self.num_heads, self.ref_dim // self.num_heads
        q = nn.Dense(self.ref_dim)(lat).reshape(b, -1, h, dk)
        k = nn.Dense(self.ref_dim)(x).reshape(b, -1, h, dk)
        v = nn.Dense(self.ref_dim)(x).reshape(b, -1, h, dk)
        w = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", q / math.sqrt(dk), k), -1)
        lat = nn.Dense(self.ref_dim)(
            jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, -1, self.ref_dim)
        )
        y = jnp.concatenate([lat, x], axis=1)
        y = nn.Conv(self.out_dim, (3,), padding="SAME")(y)
        for _ in range(2):
            y = AttentionBlock(self.out_dim, self.num_heads)(y)
        # the reference's slice latents[:, :self.latents.shape[1], :]
        # (rvq1.py:43) indexes channels with the latent WIDTH — a no-op — so
        # the pool averages over the full latents++x sequence; match that.
        return jnp.mean(y, axis=1)  # (B, out_dim)


class MRTE1(nn.Module):
    """Latent-memory MRTE (rvq1.py:47-83). The CONTENT provides queries; the
    fixed latent bank (passed as `refer`, run through mel_enc) provides the
    keys/values — so the output keeps the content's length."""

    model_channels: int = 512
    semantic_channels: int = 1024
    gin_channels: int = 512
    num_heads: int = 16

    @nn.compact
    def __call__(self, latents, content, ge):
        import math

        geh = nn.Dense(self.model_channels)(ge)[:, None, :]  # ge_enc (1×1)
        mel = nn.Conv(self.model_channels, (3,), padding="SAME")(latents)  # mel_enc
        txt = Conv1d(self.model_channels, 1, padding=(0, 0))(content)  # text_pre
        b, tq, _ = txt.shape
        h, dk = self.num_heads, self.model_channels // self.num_heads
        q = nn.Dense(self.model_channels)(txt).reshape(b, tq, h, dk)
        k = nn.Dense(self.model_channels)(mel).reshape(b, -1, h, dk)
        v = nn.Dense(self.model_channels)(mel).reshape(b, -1, h, dk)
        w = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", q / math.sqrt(dk), k), -1)
        attn = nn.Dense(self.model_channels)(
            jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, tq, self.model_channels)
        )
        x = attn + txt + geh
        return Conv1d(self.semantic_channels, 1, padding=(0, 0))(x)


class RVQ1TextEncoder(nn.Module):
    """Quantized-content prior with a 256-latent retrieval memory
    (rvq1.py:84-123): conv + N AttentionBlocks → MRTE (content queries the
    latent bank) → N AttentionBlocks → proj. Output length = content length."""

    dim: int = 768
    out_channels: int = 192
    gin_channels: int = 512
    num_layers: int = 3
    num_heads: int = 16
    num_latents: int = 256

    @nn.compact
    def __call__(self, x, ge):
        h = nn.Conv(self.dim, (3,), padding="SAME")(x)
        for _ in range(self.num_layers):
            h = AttentionBlock(self.dim, self.num_heads)(h)
        latents = self.param("latents", nn.initializers.normal(0.02),
                             (self.num_latents, self.dim))
        lat = jnp.tile(latents[None], (x.shape[0], 1, 1))
        h = MRTE1(model_channels=self.dim, semantic_channels=self.dim,
                  gin_channels=self.gin_channels, num_heads=16)(lat, h, ge)
        for _ in range(self.num_layers):
            h = AttentionBlock(self.dim, self.num_heads)(h)
        stats = Conv1d(self.out_channels * 2, 1, padding=(0, 0))(h)
        m, logs = jnp.split(stats, 2, axis=-1)
        return h, m, logs


class WNEncoder(nn.Module):
    """1×1 in-proj → WN → out-proj (SemanticEncoder/SpecEncoder,
    rvq1.py:125-188)."""

    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    num_layers: int = 16
    gin_channels: int = 0
    posterior: bool = False  # SpecEncoder: emit (z, m, logs)

    @nn.compact
    def __call__(self, x, g=None, noise_key=None):
        if g is not None:
            g = jax.lax.stop_gradient(g)
        mask = jnp.ones(x.shape[:2] + (1,), x.dtype)
        h = Conv1d(self.hidden_channels, 1, padding=(0, 0))(x)
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.num_layers, gin_channels=self.gin_channels)(h, mask, g=g)
        if not self.posterior:
            return Conv1d(self.out_channels, 1, padding=(0, 0))(h)
        stats = Conv1d(self.out_channels * 2, 1, padding=(0, 0))(h)
        m, logs = jnp.split(stats, 2, axis=-1)
        if noise_key is not None:
            z = m + jax.random.normal(noise_key, m.shape) * jnp.exp(logs)
        else:
            z = m
        return z, m, logs


class RVQ1(nn.Module):
    spec_channels: int = 1025
    hubert_channels: int = 1024
    inter_channels: int = 192
    dim: int = 192
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    upsample_rates: Tuple[int, ...] = (10, 8, 2, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 8, 2, 2)
    gin_channels: int = 512
    segment_frames: int = 32
    codebook_bins: int = 1024

    def setup(self):
        self.semantic_proj = Conv1d(self.hubert_channels, 3, stride=2,
                                    padding=(1, 1))
        self.text_enc = RVQ1TextEncoder(768, self.inter_channels,
                                        self.gin_channels, 3, 16)
        self.semantic_enc = WNEncoder(self.hubert_channels, self.dim,
                                      gin_channels=self.gin_channels)
        self.spec_enc = WNEncoder(self.inter_channels, self.dim,
                                  gin_channels=self.gin_channels, posterior=True)
        self.dec = Generator(
            self.inter_channels, self.resblock_kernel_sizes,
            self.resblock_dilation_sizes, self.upsample_rates,
            self.upsample_initial_channel, self.upsample_kernel_sizes,
            gin_channels=self.gin_channels,
        )
        self.flow = ResidualCouplingBlock(
            self.inter_channels, self.dim, 5, 1, 4, gin_channels=self.gin_channels
        )
        self.ref_pre = Conv1d(1024, 3, stride=2, padding=(1, 1))
        self.ref_enc = RefEncoder(1024, self.gin_channels)
        self.quantizer = ResidualVQ(dim=self.hubert_channels, n_q=1,
                                    bins=self.codebook_bins)

    def _ge(self, spec):
        return self.ref_enc(self.ref_pre(spec))

    def _quantized_content(self, spec, ge, train: bool):
        semantic = self.semantic_enc(spec, g=ge)
        sem_down = self.semantic_proj(semantic)
        quantized, codes, commit_loss = self.quantizer(sem_down, train=train)
        quantized = jnp.repeat(quantized, 2, axis=1)
        return semantic, quantized, codes, commit_loss

    def __call__(self, spec, hubert, train: bool = True):
        """Training forward (rvq1.py:305-332). spec (B, T, spec_ch), hubert
        (B, T, 1024) distillation target."""
        ge = self._ge(spec)
        semantic, quantized, codes, commit_loss = self._quantized_content(
            spec, ge, train
        )
        semantic_loss = jnp.mean(jnp.abs(jax.lax.stop_gradient(hubert) - semantic))
        x, m_p, logs_p = self.text_enc(quantized, ge)
        nk = self.make_rng("noise") if train else None
        z, m_q, logs_q = self.spec_enc(spec, g=ge, noise_key=nk)
        z_p = self.flow(z, jnp.ones(z.shape[:2] + (1,)), g=ge)
        if train:
            z_slice, ids_slice = rand_slice_segments(
                self.make_rng("slice"), z,
                jnp.full((z.shape[0],), z.shape[1]), self.segment_frames,
            )
        else:
            z_slice, ids_slice = z[:, : self.segment_frames], jnp.zeros(
                (z.shape[0],), jnp.int32
            )
        o = self.dec(z_slice, g=ge)
        return o, commit_loss, ids_slice, (z, z_p, m_p, logs_p, m_q, logs_q), quantized, semantic_loss

    def infer(self, spec, noise_scale: float = 0.5):
        ge = self._ge(spec)
        _, quantized, codes, _ = self._quantized_content(spec, ge, train=False)
        x, m_p, logs_p = self.text_enc(quantized, ge)
        noise = jax.random.normal(self.make_rng("noise"), m_p.shape)
        z_p = m_p + noise * jnp.exp(logs_p) * noise_scale
        mask = jnp.ones(z_p.shape[:2] + (1,))
        z = self.flow(z_p, mask, g=ge, reverse=True)
        return self.dec(z, g=ge)

    def decode(self, codes, refer_spec, noise_scale: float = 0.5):
        """codes (n_q, B, T) + reference spec → wav (intended semantics of
        rvq1.py:353-366)."""
        ge = self._ge(refer_spec)
        quantized = self.quantizer.decode(codes)
        quantized = jnp.repeat(quantized, 2, axis=1)
        x, m_p, logs_p = self.text_enc(quantized, ge)
        noise = jax.random.normal(self.make_rng("noise"), m_p.shape)
        z_p = m_p + noise * jnp.exp(logs_p) * noise_scale
        mask = jnp.ones(z_p.shape[:2] + (1,))
        z = self.flow(z_p, mask, g=ge, reverse=True)
        return self.dec(z, g=ge)

    def extract_code(self, spec):
        """spec → codes (B, n_q, T/2) (rvq1.py:368-373 — `.vq` sidecars)."""
        ge = self._ge(spec)
        _, _, codes, _ = self._quantized_content(spec, ge, train=False)
        return jnp.transpose(codes, (1, 0, 2))

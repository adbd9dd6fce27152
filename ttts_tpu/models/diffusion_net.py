"""AA_diffusion — latent-conditioned mel diffusion network.

TPU-native rebuild of ttts/diffusion/aa_model.py:182-289 (flat non-U-Net
stack): conv input block on the noisy 100-ch mel; a latent conditioner
(conv + 3 rel-pos AttentionBlocks, aa_model.py:215) over the GPT latent; a
reference encoder (conv + 3 AttentionBlocks + perceiver RefEncoder pooling,
aa_model.py:227 → style vector added to the latent embedding,
timestep_independent aa_model.py:245-248); classifier-free dropout by swapping
in a learned unconditioned embedding (aa_model.py:250-256); 3-layer
conditioning-timestep integrator; concat + integrating conv; num_layers×
DiffusionLayer (scale-shift ResBlock + rel-pos attention, aa_model.py:135) +
3 ResBlocks; GroupNorm→SiLU→conv out to 200 ch (ε mean + learned-range var).

Attention uses the T5-bucket relative position bias
(ttts/utils/xtransformers.py RelativePositionBias:146, buckets=32, max
distance=64) and the double-sqrt scaling of QKVAttentionLegacy
(ttts/utils/utils.py:136-169). Layer-drop (0.1) is stochastic depth via
masking — branchless under jit, so no DDP-style unused-param tricks needed.

All tensors channels-last: x (B, T, C).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.config import DiffusionNetConfig

TACOTRON_MEL_MAX = 5.5451774444795624753378569716654
TACOTRON_MEL_MIN = -16.118095650958319788125940182791


def normalize_tacotron_mel(mel):
    """v2 scale-only normalization (aa_model.py:14-23)."""
    return jnp.maximum(mel, -TACOTRON_MEL_MAX) * 0.18215


def denormalize_tacotron_mel(norm_mel):
    return norm_mel / 0.18215


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding, cos-first (aa_model.py:33-51); accepts
    fractional timesteps (the DPM++ path passes t*1000 floats)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _num_groups(channels: int) -> int:
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups //= 2
    assert groups > 2
    return groups


class GroupNorm32(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=_num_groups(self.channels), epsilon=1e-5)(x)


def _t5_bucket(rel_pos: np.ndarray, num_buckets: int = 32, max_distance: int = 64) -> np.ndarray:
    """Symmetric T5 relative-position bucketing (xtransformers.py:156-175)."""
    n = -rel_pos
    num_buckets //= 2
    ret = (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)
    max_exact = num_buckets // 2
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(n < max_exact, n, val_if_large)


class RelativePositionBias(nn.Module):
    """T5-bucket relative position bias. The bias matrix is Toeplitz
    (depends only on j−i), so we gather only the (2T−1,) diagonal values and
    materialize the square with the VITS skew reshape. For sampling scans the
    bias should be computed ONCE outside the scan via `bias()` and passed
    through the closure — recomputing (T, T)-shaped bias inside a scan body
    costs ~10× the attention itself on TPU."""

    heads: int
    num_buckets: int = 32
    max_distance: int = 64
    scale: float = 1.0

    def setup(self):
        self.table = nn.Embed(self.num_buckets, self.heads)

    def strip(self, t: int) -> jax.Array:
        """(heads, 2t−1) Toeplitz diagonal values (bias[h,i,j] = strip[h,
        j−i+t−1]) — the form the Pallas flash-attention kernel consumes."""
        rel_1d = np.arange(-(t - 1), t)
        buckets = jnp.asarray(_t5_bucket(rel_1d, self.num_buckets, self.max_distance))
        return jnp.transpose(self.table(buckets), (1, 0)) * self.scale

    def bias(self, i: int, j: int) -> jax.Array:
        from ttts_tpu.models.blocks import _rel_to_abs

        if i == j:
            rel_1d = np.arange(-(i - 1), i)  # j - i along diagonals
            buckets = jnp.asarray(
                _t5_bucket(rel_1d, self.num_buckets, self.max_distance)
            )
            vals = self.table(buckets)  # (2T-1, H)
            rel = jnp.broadcast_to(
                jnp.transpose(vals, (1, 0))[None, :, None, :],
                (1, self.heads, i, 2 * i - 1),
            )
            out = _rel_to_abs(rel)  # (1, H, T, T)
        else:  # cross-shaped scores: direct 2D gather
            rel = np.arange(j)[None, :] - np.arange(i)[:, None]
            buckets = jnp.asarray(_t5_bucket(rel, self.num_buckets, self.max_distance))
            out = jnp.transpose(self.table(buckets), (2, 0, 1))[None]
        return out * self.scale

    def __call__(self, qk_dots):
        i, j = qk_dots.shape[-2:]
        return qk_dots + self.bias(i, j)


class AttentionBlock(nn.Module):
    """GroupNorm → fused qkv 1×1 → MHA with rel-pos bias → zero-init proj →
    residual (utils.AttentionBlock:172-215).

    Pass a precomputed `rel_bias` (from `.rel_bias(t)`) when calling inside a
    sampling scan; otherwise the bias is computed inline."""

    channels: int
    num_heads: int = 1
    relative_pos_embeddings: bool = True
    dtype: Any = jnp.float32
    # Pallas fused attention (ops/pallas/attention.py): scores never touch
    # HBM. Used on the per-step trunk path (T is a multiple of 128 there);
    # when flash is set, a precomputed rel_bias is the (H, 2T−1) STRIP.
    flash: bool = False
    # Pallas fused GroupNorm→qkv producer (ops/pallas/resblock.py
    # fused_gn_qkv): one HBM pass for the norm+projection chain feeding the
    # attention. Engaged with the same gates as the trunk resblock kernel.
    fused_gn: bool = False
    # sequence parallelism (SURVEY §5.7): shard the time axis over
    # `sp_axis` of `sp_mesh` and run ring attention (parallel/
    # ring_attention.py) — exact attention with O(T/n · T/n) scores per
    # chip, for the T≥4k long-utterance shapes the flash kernel's VMEM
    # bound can't hold. The rel-pos bias rides along in Toeplitz-strip
    # form; each hop gathers its local diagonal window, so the (T, T)
    # bias never materializes either.
    sp_mesh: Any = None
    sp_axis: str = "sp"

    def setup(self):
        c = self.channels
        self.norm = GroupNorm32(c)
        self.qkv = nn.Dense(3 * c, dtype=self.dtype)
        self.proj = nn.Dense(c, kernel_init=nn.initializers.zeros, dtype=self.dtype)
        if self.relative_pos_embeddings:
            dk = c // self.num_heads
            self.relpos = RelativePositionBias(heads=self.num_heads, scale=dk**0.5)

    def rel_bias(self, t: int, b: int = 1):
        if not self.relative_pos_embeddings:
            return None
        return (self.relpos.strip(t)
                if (self._use_ring(t) or self._use_flash(t, b))
                else self.relpos.bias(t, t))

    def _use_ring(self, t: int) -> bool:
        if self.sp_mesh is None:
            return False
        n = self.sp_mesh.shape[self.sp_axis]
        return n > 1 and t % n == 0

    def _use_flash(self, t: int, b: int = 1) -> bool:
        # measured on v5e at the trunk shape (H=16, D=32), round-4 kernel
        # (per-(batch,head) grid + div-after-PV, amort-64 slopes): BATCHED
        # the kernel wins big (B=8, T=896: 0.35 vs 0.98 ms einsum, 2.8×);
        # single-stream XLA's fused attention still wins small shapes
        # (B=2, T=896: 0.090 vs 0.106; B=1: 0.063 vs 0.079) — the per-
        # program pipeline overhead isn't amortized, so keep the einsum
        # path below the b·t threshold. Upper bound: the per-program
        # (blk, T) f32 score tile + two Toeplitz temporaries must fit the
        # 16 MiB scoped-VMEM stack — chip-verified finite through T=6144
        # (the round-3 all-heads-resident kernel capped out near T≈3.9k);
        # past it fall back to the XLA einsum path (ring attention covers
        # the genuinely long shapes on a mesh).
        return (self.flash and t % 128 == 0
                and (t >= 1536 or b * t >= 4096)
                and t <= 6144
                and jax.default_backend() not in ("cpu",))

    def _use_fused_gn(self, x) -> bool:
        _, t, c = x.shape
        return (self.fused_gn and not self.is_initializing()
                and c % 128 == 0 and t % 8 == 0
                # 2 f32 slabs (x, normalized) + the (T, 3C) product + weights
                and t * c * 4 * 5 + 3 * c * c * x.dtype.itemsize <= 12 * 2**20
                and jax.default_backend() not in ("cpu",))

    def __call__(self, x, rel_bias=None):
        b, t, c = x.shape
        h = self.num_heads
        dk = c // h
        if self._use_fused_gn(x):
            from ttts_tpu.ops.pallas.resblock import fused_gn_qkv

            gn = self.get_variable("params", "norm")["GroupNorm_0"]
            pq = self.get_variable("params", "qkv")
            # cast to the module compute dtype first (what nn.Dense(dtype=…)
            # does inside the XLA path); an f32 cond-path input otherwise
            # doubles every kernel slab and blows the scoped-VMEM stack
            qkv = fused_gn_qkv(x.astype(self.dtype), gn["scale"], gn["bias"],
                               pq["kernel"], pq["bias"],
                               groups=_num_groups(c))
        else:
            qkv = self.qkv(self.norm(x))
        # legacy layout: per head, [q;k;v] channels (utils.py:155)
        qkv = qkv.reshape(b, t, h, 3 * dk)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self._use_ring(t):
            from ttts_tpu.parallel.ring_attention import make_ring_attention

            strip = rel_bias
            if strip is None and self.relative_pos_embeddings:
                strip = self.relpos.strip(t)
            assert strip is None or strip.ndim == 2, (
                "sequence-parallel attention needs the strip-form bias "
                "(rel_bias(t) returns it when sp_mesh is set)")
            ring = make_ring_attention(
                self.sp_mesh, self.sp_axis, causal=False,
                with_bias=strip is not None, scale=1.0 / math.sqrt(dk))
            a = ring(q, k, v, strip) if strip is not None else ring(q, k, v)
            return x + self.proj(a.reshape(b, t, c))
        # a precomputed bias pins the path: (H, 2T−1) strip → flash kernel,
        # (H, T, T) full → XLA einsum (no gate-consistency trap between
        # rel_bias() precompute time and call time)
        use_flash = (self._use_flash(t, b) if rel_bias is None
                     else rel_bias.ndim == 2)
        if use_flash:
            from ttts_tpu.ops.pallas.attention import flash_attention

            strip = rel_bias
            if strip is None and self.relative_pos_embeddings:
                strip = self.relpos.strip(t)
            a = flash_attention(q, k, v, strip=strip, scale=1.0 / math.sqrt(dk))
            return x + self.proj(a.reshape(b, t, c))
        scale = 1.0 / math.sqrt(math.sqrt(dk))
        w = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale)
        if self.relative_pos_embeddings:
            if rel_bias is None:
                rel_bias = self.relpos.bias(t, t)
            w = w + rel_bias.astype(w.dtype)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(x.dtype)
        a = jnp.einsum("bhts,bshd->bthd", w, v).reshape(b, t, c)
        a = self.proj(a)
        return x + a


class ScaleShiftResBlock(nn.Module):
    """ResBlock with scale-shift (FiLM) timestep conditioning
    (aa_model.py:72-133, use_scale_shift_norm=True, efficient 1×1 in/skip).

    `fused=True` routes the deterministic TPU forward through the Pallas
    whole-block kernel (ops/pallas/resblock.py): the GN→SiLU→Dense→GN·FiLM→
    SiLU→conv3→residual chain reads/writes HBM once instead of ~10× — this
    chain is bandwidth-bound and ~75% of the serving denoiser step after the
    flash-attention work. Child modules carry EXPLICIT names (the flax
    auto-names) so the param tree is identical whichever path runs; the
    emb→(scale, shift) Dense always runs in XLA (a (B, C) matmul)."""

    channels: int
    emb_channels: int
    out_channels: Optional[int] = None
    dropout: float = 0.0
    kernel_size: int = 3
    dtype: Any = jnp.float32
    fused: bool = False

    def _use_fused(self, x, deterministic: bool) -> bool:
        out_ch = self.out_channels or self.channels
        _, t, c = x.shape
        return (self.fused and deterministic and not self.is_initializing()
                and out_ch == self.channels == c
                and self.kernel_size == 3
                and c % 128 == 0 and t % 8 == 0
                # per-program f32 working set ≈ 5 (T, C) slabs + weights
                # must fit the 16 MiB scoped-VMEM stack (CLAUDE.md lesson g)
                and t * c * 4 * 5 + 4 * c * c * x.dtype.itemsize <= 12 * 2**20
                and jax.default_backend() not in ("cpu",))

    @nn.compact
    def __call__(self, x, emb, deterministic=True):
        out_ch = self.out_channels or self.channels
        e = nn.Dense(2 * out_ch, name="Dense_1")(jax.nn.silu(emb))  # (B, 2C)
        scale, shift = jnp.split(e, 2, axis=-1)
        if self._use_fused(x, deterministic):
            from ttts_tpu.ops.pallas.resblock import fused_scale_shift_resblock

            p = lambda name: self.get_variable("params", name)
            gn1, gn2 = p("GroupNorm32_0")["GroupNorm_0"], p("GroupNorm32_1")["GroupNorm_0"]
            a2 = gn2["scale"] * (1 + scale)
            b2 = gn2["bias"] * (1 + scale) + shift
            # compute-dtype cast up front (the XLA path's Dense/Conv would
            # cast anyway; keeps f32 cond-path inputs from doubling the
            # kernel's VMEM slabs). Costs one bf16 rounding of the residual.
            return fused_scale_shift_resblock(
                x.astype(self.dtype), gn1["scale"], gn1["bias"],
                p("Dense_0")["kernel"], p("Dense_0")["bias"],
                a2, b2, p("Conv_0")["kernel"], p("Conv_0")["bias"],
                groups=_num_groups(self.channels),
            )
        h = GroupNorm32(self.channels, name="GroupNorm32_0")(x)
        h = jax.nn.silu(h)
        # efficient_config: 1×1 conv
        h = nn.Dense(out_ch, dtype=self.dtype, name="Dense_0")(h)
        h = (GroupNorm32(out_ch, name="GroupNorm32_1")(h) * (1 + scale[:, None, :])
             + shift[:, None, :])
        h = jax.nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(out_ch, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="Conv_0")(h)
        skip = (x if out_ch == self.channels
                else nn.Dense(out_ch, dtype=self.dtype, name="Dense_2")(x))
        return skip + h


class DiffusionLayer(nn.Module):
    """ScaleShiftResBlock + rel-pos AttentionBlock (aa_model.py:135-148)."""

    channels: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    flash: bool = False
    fused_res: bool = False
    sp_mesh: Any = None
    sp_axis: str = "sp"

    def setup(self):
        self.resblk = ScaleShiftResBlock(self.channels, self.channels,
                                         self.channels, self.dropout,
                                         dtype=self.dtype,
                                         fused=self.fused_res)
        # NOTE: fused_gn deliberately NOT tied to fused_res — measured
        # NEGATIVE in the real trunk (7.83 vs 7.22 ms baseline at B=8,
        # T=768): the standalone GN→qkv kernel breaks XLA's fusion of the
        # attention producer into its neighbours and re-pays stats per
        # column block. Kept available for other shapes/callers.
        self.attn = AttentionBlock(self.channels, self.num_heads, dtype=self.dtype,
                                   flash=self.flash,
                                   sp_mesh=self.sp_mesh, sp_axis=self.sp_axis)

    def __call__(self, x, time_emb, deterministic=True, rel_bias=None):
        y = self.resblk(x, time_emb, deterministic)
        return self.attn(y, rel_bias=rel_bias)


class RefEncoder(nn.Module):
    """Perceiver-style pooling of the reference embedding: 32 learned latents
    cross-attend to the sequence, concat, attention stack, mean-pool
    (aa_model.py:150-178). Returns (B, dim)."""

    dim: int
    num_latents: int = 32
    num_heads: int = 8

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        latents = self.param(
            "latents", nn.initializers.normal(0.02), (self.num_latents, self.dim)
        )
        lat = jnp.tile(latents[None], (b, 1, 1))
        # cross attention: queries=latents, kv=x (vc_utils.MultiHeadAttention)
        h = self.num_heads
        dk = self.dim // h
        q = nn.Dense(self.dim)(lat).reshape(b, -1, h, dk)
        k = nn.Dense(self.dim)(x).reshape(b, -1, h, dk)
        v = nn.Dense(self.dim)(x).reshape(b, -1, h, dk)
        w = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q / math.sqrt(dk), k).astype(jnp.float32), -1
        ).astype(x.dtype)
        lat = nn.Dense(self.dim)(jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, -1, self.dim))

        y = jnp.concatenate([lat, x], axis=1)
        y = nn.Conv(self.dim, (3,), padding="SAME")(y)
        for _ in range(4):
            y = AttentionBlock(self.dim, self.num_heads)(y)
        # the reference's trailing slice latents[:, :self.latents.shape[1], :]
        # (aa_model.py:177) indexes CHANNELS with the channel count — a no-op —
        # so the pool averages over the full latents++x sequence; match that.
        return jnp.mean(y, axis=1)


class AA_diffusion(nn.Module):
    cfg: DiffusionNetConfig
    dtype: Any = jnp.float32  # trunk activation dtype; bf16 on TPU inference
    # Pallas fused attention for the PER-STEP path (integrator + trunk
    # layers, which run at out_len — a multiple of 128). The once-per-
    # utterance conditioning encoders keep the XLA path (arbitrary lengths).
    flash: bool = False
    # Pallas whole-block ScaleShiftResBlock kernel for the same per-step
    # path (ops/pallas/resblock.py — one HBM read+write per block instead
    # of ~10; engaged only on deterministic TPU forwards at fitting shapes).
    fused_res: bool = False
    # sequence parallelism for the per-step path (SURVEY §5.7): shard the
    # output time axis over sp_axis of sp_mesh and run ring attention in the
    # integrator + trunk layers. For long utterances (T≥4k) whose (B,H,T,T)
    # scores exceed HBM/VMEM bounds on one chip.
    sp_mesh: Any = None
    sp_axis: str = "sp"

    def setup(self):
        c = self.cfg
        ch = c.model_channels
        self.inp_block = nn.Conv(ch, (3,), padding="SAME")
        self.time_embed = [nn.Dense(ch), nn.Dense(ch)]
        self.code_norm = GroupNorm32(ch)
        self.latent_conditioner = [
            nn.Conv(ch, (3,), padding="SAME"),
            AttentionBlock(ch, c.num_heads),
            AttentionBlock(ch, c.num_heads),
            AttentionBlock(ch, c.num_heads),
        ]
        self.unconditioned_embedding = self.param(
            "unconditioned_embedding", nn.initializers.normal(1.0), (1, 1, ch)
        )
        self.conditioning_timestep_integrator = [
            DiffusionLayer(ch, c.num_heads, c.dropout, dtype=self.dtype,
                           flash=self.flash, fused_res=self.fused_res,
                           sp_mesh=self.sp_mesh, sp_axis=self.sp_axis)
            for _ in range(3)
        ]
        self.refer_conv = nn.Conv(ch, (3,), padding="SAME")
        self.refer_attn = [AttentionBlock(ch, c.num_heads) for _ in range(3)]
        self.refer_pool = RefEncoder(ch)
        self.integrating_conv = nn.Dense(ch)
        self.layers = [
            DiffusionLayer(ch, c.num_heads, c.dropout, dtype=self.dtype,
                           flash=self.flash, fused_res=self.fused_res,
                           sp_mesh=self.sp_mesh, sp_axis=self.sp_axis)
            for _ in range(c.num_layers)
        ] + [
            ScaleShiftResBlock(ch, ch, ch, c.dropout, dtype=self.dtype,
                               fused=self.fused_res)
            for _ in range(3)
        ]
        self.out_norm = GroupNorm32(ch)
        self.out_conv = nn.Conv(c.out_channels, (3,), padding="SAME")

    def _latent_emb(self, latent):
        h = latent
        for m in self.latent_conditioner:
            h = m(h)
        return h

    def _refer_emb(self, refer):
        h = self.refer_conv(refer)
        for m in self.refer_attn:
            h = m(h)
        return self.refer_pool(h)

    def timestep_independent(self, latent, refer, expected_seq_len: int,
                             train: bool = False, uncond_key=None,
                             unconditioned_percentage: float = 0.1):
        """Conditioning embedding at the output frame rate (aa_model.py:245-257).
        latent (B, Tl, in_latent), refer (B, Tr, in_channels) → (B, T, ch)."""
        latent_emb = self._latent_emb(latent)
        refer_emb = self._refer_emb(refer)
        latent_emb = self.code_norm(latent_emb) + refer_emb[:, None, :]
        if train and uncond_key is not None and unconditioned_percentage > 0:
            b = latent_emb.shape[0]
            drop = jax.random.uniform(uncond_key, (b, 1, 1)) < unconditioned_percentage
            latent_emb = jnp.where(drop, self.unconditioned_embedding, latent_emb)
        return _nearest_interp(latent_emb, expected_seq_len)

    def rel_biases(self, t_len: int, b: int = 1):
        """Per-attention rel-pos bias tensors at sequence length t_len.
        Compute ONCE before a sampling scan and pass to trunk(rel_biases=...)
        — inside-scan recomputation costs ~10× the attention itself.
        `b` is the batch the trunk will run at (2× streams under batched
        CFG): it selects strip-form biases (flash kernel) when the batched
        shape favors the Pallas path."""
        biases = [m.attn.rel_bias(t_len, b)
                  for m in self.conditioning_timestep_integrator]
        for lyr in self.layers:
            if isinstance(lyr, DiffusionLayer):
                biases.append(lyr.attn.rel_bias(t_len, b))
        return biases

    def trunk(self, x, timesteps, cond_emb, train: bool = False, layerdrop_key=None,
              rel_biases=None):
        """Noisy mel (B, T, in_channels) + conditioning (B, T, ch) → (B, T, out)."""
        c = self.cfg
        t_emb = timestep_embedding(timesteps, c.model_channels)
        t_emb = self.time_embed[1](jax.nn.silu(self.time_embed[0](t_emb)))

        bi = iter(rel_biases) if rel_biases is not None else None
        h = cond_emb
        for m in self.conditioning_timestep_integrator:
            h = m(h, t_emb, deterministic=not train,
                  rel_bias=next(bi) if bi else None)
        x = self.inp_block(x)
        x = self.integrating_conv(jnp.concatenate([x, h], axis=-1))
        n = len(self.layers)
        for i, lyr in enumerate(self.layers):
            if isinstance(lyr, DiffusionLayer):
                y = lyr(x, t_emb, deterministic=not train,
                        rel_bias=next(bi) if bi else None)
            else:
                y = lyr(x, t_emb, deterministic=not train)
            if train and self.cfg.layer_drop > 0 and layerdrop_key is not None and 0 < i < n - 1:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(layerdrop_key, i), 1.0 - self.cfg.layer_drop
                )
                x = jnp.where(keep, y, x)  # stochastic depth (aa_model.py:274-279)
            else:
                x = y
        x = jax.nn.silu(self.out_norm(x.astype(jnp.float32)))
        return self.out_conv(x)

    def __call__(self, x, timesteps, latent=None, refer=None,
                 conditioning_free: bool = False, train: bool = False,
                 unconditioned_percentage: float = 0.1):
        """Reference-parity entry (aa_model.py:260-289)."""
        if conditioning_free:
            cond = jnp.tile(self.unconditioned_embedding, (x.shape[0], x.shape[1], 1))
        else:
            uncond_key = self.make_rng("uncond") if train else None
            cond = self.timestep_independent(
                latent, refer, x.shape[1], train=train, uncond_key=uncond_key,
                unconditioned_percentage=unconditioned_percentage,
            )
        ld_key = self.make_rng("layerdrop") if train and self.cfg.layer_drop > 0 else None
        return self.trunk(x, timesteps, cond, train=train, layerdrop_key=ld_key)


def _nearest_interp(x: jax.Array, out_len: int) -> jax.Array:
    """torch F.interpolate(mode='nearest') along time for (B, T, C)."""
    t = x.shape[1]
    idx = (jnp.arange(out_len) * t) // out_len
    return x[:, idx]

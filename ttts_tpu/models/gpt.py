"""UnifiedVoice — VALL-E/Tortoise-style AR model over text + mel-VQ codes.

TPU-native rebuild of ttts/gpt/model.py:292-572. The reference wraps HF GPT-2
(build_hf_gpt_transformer, model.py:245-265) with its positional/token
embeddings deleted and drives inference through HF `generate` one token at a
time (GPT2InferenceModel, model.py:34-185). Here the decoder is a plain
pre-LN GPT-2 stack in flax and inference is a single jitted `lax.scan` with a
static KV cache — no Python in the hot loop.

Contract kept (for weight porting / output parity):
  - dual learned position tables: text (max_text+2) and mel (max_mel+2)
    (model.py:333-339), normal(0.02) init;
  - token layout: [start_text; text; stop_text] ++ [start_mel; codes; stop_mel]
    (build_aligned_inputs_and_targets, model.py:397-401);
  - mel padding rewritten to stop tokens past wav_len//mel_length_compression+1
    (set_mel_padding, model.py:402-414);
  - cross-entropy over BOTH streams incl. repeated stop tokens (model.py:508);
  - return_latent: final_norm hidden states of the mel segment minus the two
    trailing tokens (model.py:498-500) — the diffusion conditioning signal;
  - inference prompt: text embedding ++ [start_mel; prompt codes]
    (inference_speech, model.py:533-562); sampling knobs top_p / temperature /
    repetition_penalty / typical_sampling have HF semantics.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttts_tpu.config import GPTConfig
from ttts_tpu.models.sampling import SamplingParams, sample_logits
from ttts_tpu.ops.pallas.decode_attention import (
    decode_attention,
    decode_attention_reference,
    decode_attention_spmd,
)


def gelu_new(x):
    """GPT-2 tanh-approximated GELU."""
    return 0.5 * x * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


class KVCache(NamedTuple):
    """Per-layer KV arrays, each (max_len, head_dim, heads*B) — PACKED
    TIME-major, the layout of ops/pallas/decode_attention.py.

    Three layout decisions, all measured on v5e at the serving shapes:

    * A TUPLE of per-layer arrays rather than one stacked (layers, ...)
      tensor: with a stacked cache the decode loop sliced `cache.k[i]` per
      layer and re-`jnp.stack`ed afterwards, which materialized a fresh
      full-cache copy every step (~2×cache bytes of HBM traffic per token).
    * TIME-major (max_len leading) rather than batch-major: the per-step
      update then writes one CONTIGUOUS row — the only form Mosaic can
      express as a sliced HBM DMA, and the only form XLA's in-place
      dynamic_update_slice pass keeps in place inside the decode loop
      (batch-major cost 340 µs/step of pure cache copy at B=16, ML=512, 6L).
    * (head, batch) flattened HEAD-major into the minor dim: the TPU lane
      width is 128, so the minor dim must be a lane multiple for the fused
      kernel (head_dim=64 as minor would pad to 128 and be unsliceable);
      head-major keeps tensor-parallel head sharding a contiguous chunk."""

    k: Tuple[jax.Array, ...]
    v: Tuple[jax.Array, ...]


class GPT2Block(nn.Module):
    """Pre-LN GPT-2 block (HF GPT2Block semantics: ln_1→attn→res, ln_2→mlp→res).

    `dtype` is the compute/activation dtype (bf16 on TPU for 4× MXU rate);
    params stay f32 and the attention softmax runs in f32.

    `attn_dropout` is HF's attn_pdrop (dropout on the softmax probabilities),
    distinct from `dropout` (resid_pdrop). `flash_causal` routes the no-cache
    causal path through the Pallas TPU flash-attention kernel (differentiable
    — used in TRAINING too); it engages only when attention dropout is
    inactive (deterministic, or attn_dropout == 0), so the default reference
    semantics (attn_pdrop 0.1) are never silently changed."""

    dim: int
    heads: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    attn_dropout: Optional[float] = None  # None → same as dropout (HF default)
    flash_causal: bool = False
    # decode dispatch: True → ops/pallas/decode_attention.decode_attention
    # (fused kernel on TPU, XLA fallback elsewhere); False → always the XLA
    # formulation. decode_spmd overrides both with decode_attention_spmd,
    # whose custom_partitioning rule shards the packed bh dim so the fused
    # kernel stays engaged per-shard under a GSPMD mesh.
    fused_decode: bool = True
    decode_spmd: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        attn_mask=None,
        cache: Optional[Tuple[jax.Array, jax.Array]] = None,
        cache_index=None,
        deterministic: bool = True,
        causal: bool = False,
    ):
        d, h = self.dim, self.heads
        dk = d // h
        dense02 = partial(nn.Dense, kernel_init=nn.initializers.normal(0.02),
                          dtype=self.dtype)
        # scaled residual-projection init (GPT-2 scheme)
        proj_init = nn.initializers.normal(0.02)

        hdn = nn.LayerNorm(epsilon=1e-5)(x)
        qkv = dense02(3 * d)(hdn)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, t, _ = q.shape
        q = q.reshape(b, t, h, dk)
        k = k.reshape(b, t, h, dk)
        v = v.reshape(b, t, h, dk)

        attn = None
        if cache is not None:
            ck, cv = cache  # (max_len, dk, h*b) packed time-major, see KVCache
            kp = jnp.transpose(k, (1, 3, 2, 0)).reshape(t, dk, h * b)
            vp = jnp.transpose(v, (1, 3, 2, 0)).reshape(t, dk, h * b)
            if t == 1:
                # single-token decode: fused row-update + attention in ONE
                # HBM pass (Pallas kernel on TPU; the packed-layout XLA
                # einsum elsewhere). Under a GSPMD mesh, decode_spmd routes
                # through the custom_partitioning wrapper so the kernel runs
                # per-shard on the head-sharded cache. Rows beyond
                # cache_index are masked inside the op, so attn_mask is not
                # consulted here.
                if self.decode_spmd:
                    att = decode_attention_spmd
                elif self.fused_decode:
                    att = decode_attention
                else:
                    att = decode_attention_reference
                qp = jnp.transpose(q[:, 0], (2, 1, 0)).reshape(dk, h * b)
                out, ck, cv = att(qp, kp, vp, ck, cv, cache_index)
                attn = jnp.transpose(out.reshape(dk, h, b), (2, 1, 0))
                attn = attn.reshape(b, 1, d).astype(x.dtype)
            else:
                # prefill: write rows [cache_index, cache_index+t) and attend
                # over the FRESH rows only — the prefix is self-contained, so
                # this is exact and cheaper than masked attention over the
                # whole max_len cache.
                ck = jax.lax.dynamic_update_slice_in_dim(
                    ck, kp, cache_index, axis=0)
                cv = jax.lax.dynamic_update_slice_in_dim(
                    cv, vp, cache_index, axis=0)
                if attn_mask is not None:
                    attn_mask = attn_mask[..., :t]
            new_cache = (ck, cv)
        else:
            new_cache = None

        p_attn = self.dropout if self.attn_dropout is None else self.attn_dropout
        # the flash route drops attn_mask entirely, so it requires the CALLER
        # to declare the mask causal (causal=True) — a padding-augmented or
        # bidirectional mask must never silently become pure-causal
        if attn is not None:
            pass  # decode path computed above
        elif (self.flash_causal and causal and cache is None
                and (deterministic or p_attn == 0.0)
                and jax.default_backend() not in ("cpu",)):
            attn = _flash_causal_attention(q, k, v, 1.0 / math.sqrt(dk))
            attn = attn.astype(x.dtype).reshape(b, t, d)
        else:
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / math.sqrt(dk)
            if attn_mask is not None:
                scores = jnp.where(attn_mask, scores, jnp.finfo(jnp.float32).min)
            p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            if p_attn > 0:
                p = nn.Dropout(p_attn)(p, deterministic=deterministic)
            attn = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
        attn = nn.Dense(d, kernel_init=proj_init, dtype=self.dtype)(attn)
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = x + attn

        hdn = nn.LayerNorm(epsilon=1e-5)(x)
        hdn = dense02(4 * d)(hdn)
        hdn = gelu_new(hdn)
        hdn = nn.Dense(d, kernel_init=proj_init, dtype=self.dtype)(hdn)
        if self.dropout > 0:
            hdn = nn.Dropout(self.dropout)(hdn, deterministic=deterministic)
        return x + hdn, new_cache


class GPT2Stack(nn.Module):
    """GPT-2 transformer body. Includes HF GPT2Model's trailing ln_f — the
    reference consumes `last_hidden_state` (post-ln_f) and then applies its
    own final_norm on top (model.py:424-429), so BOTH norms are in the path."""

    layers: int
    dim: int
    heads: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    use_ln_f: bool = True
    remat: bool = False
    attn_dropout: Optional[float] = None
    flash_causal: bool = False
    fused_decode: bool = True
    decode_spmd: bool = False

    @nn.compact
    def __call__(self, emb, attn_mask=None, cache: Optional[KVCache] = None,
                 cache_index=None, deterministic: bool = True,
                 causal: bool = False):
        x = emb.astype(self.dtype)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        block_cls = GPT2Block
        if self.remat and cache is None:
            # rematerialize block activations in the backward pass
            # (the reference's gradient_checkpointing flag, model.py:252)
            block_cls = nn.remat(GPT2Block, static_argnums=(5, 6))
        new_k, new_v = [], []
        for i in range(self.layers):
            layer_cache = (cache.k[i], cache.v[i]) if cache is not None else None
            # explicit name: keeps the param tree identical whether remat is
            # on or off (nn.remat renames the auto-scope otherwise, which
            # would invalidate checkpoints when toggling the flag)
            x, nc = block_cls(self.dim, self.heads, self.dropout, self.dtype,
                              self.attn_dropout, self.flash_causal,
                              self.fused_decode, self.decode_spmd,
                              name=f"GPT2Block_{i}")(
                x, attn_mask, layer_cache, cache_index, deterministic, causal
            )
            if nc is not None:
                new_k.append(nc[0])
                new_v.append(nc[1])
        if self.use_ln_f:
            x = nn.LayerNorm(epsilon=1e-5, name="ln_f")(x)
        new_cache = KVCache(tuple(new_k), tuple(new_v)) if new_k else None
        return x, new_cache


def _causal_mask(t: int) -> jax.Array:
    return jnp.tril(jnp.ones((t, t), bool))[None, None]


def _flash_causal_attention(q, k, v, sm_scale: float) -> jax.Array:
    """Causal attention through the Pallas TPU flash kernel (differentiable —
    backed by a custom VJP, so it serves the TRAINING path too; scores never
    materialize in HBM, unlike the einsum path's (B,H,T,T) f32 tensor that
    XLA must also save for backward).

    q, k, v: (B, T, H, D) → (B, T, H, D). T is padded up to a multiple of 512
    (the kernel's grid constraint): under a causal mask, padded KEYS sit
    beyond every valid query's horizon and padded QUERY rows are sliced off,
    so padding is exact, not approximate."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention as tpu_flash_attention,
    )

    b, t, h, d = q.shape
    blk = 512 if t >= 512 else 128
    t_pad = ((t + blk - 1) // blk) * blk
    pad = ((0, 0), (0, t_pad - t), (0, 0), (0, 0))
    qt = jnp.transpose(jnp.pad(q, pad), (0, 2, 1, 3))
    kt = jnp.transpose(jnp.pad(k, pad), (0, 2, 1, 3))
    vt = jnp.transpose(jnp.pad(v, pad), (0, 2, 1, 3))
    # the library default (all blocks 128, block_b=1) runs a huge grid of
    # tiny tiles: 45.6 ms/apply at (B=64, H=8, T=2048, dk=64) vs 7.7 ms with
    # 1024-wide blocks (chip sweep, 5.9×) — pick the largest block ≤1024
    # that divides the padded length
    bq = next(c for c in (1024, 512, 256, 128) if t_pad % c == 0)
    sizes = BlockSizes(
        block_q=bq, block_k_major=bq, block_k=bq, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bq, block_k_dkv=bq,
        block_q_dkv=bq, block_k_major_dq=bq, block_k_dq=bq, block_q_dq=bq,
    )
    out = tpu_flash_attention(qt, kt, vt, causal=True, sm_scale=sm_scale,
                              block_sizes=sizes)
    return jnp.transpose(out, (0, 2, 1, 3))[:, :t]


class UnifiedVoice(nn.Module):
    cfg: GPTConfig
    mel_length_compression: int = 1024
    dtype: Any = jnp.float32  # activation dtype; bf16 on TPU

    def setup(self):
        c = self.cfg
        self.text_embedding = nn.Embed(
            c.number_text_tokens + 1, c.model_dim,
            embedding_init=nn.initializers.normal(0.02),
        )
        self.mel_embedding = nn.Embed(
            c.number_mel_codes, c.model_dim,
            embedding_init=nn.initializers.normal(0.02),
        )
        self.text_pos_embedding = self.param(
            "text_pos_embedding", nn.initializers.normal(0.02),
            (c.max_text_tokens + 2, c.model_dim),
        )
        self.mel_pos_embedding = self.param(
            "mel_pos_embedding", nn.initializers.normal(0.02),
            (c.max_mel_tokens + 2, c.model_dim),
        )
        self.gpt = GPT2Stack(c.layers, c.model_dim, c.heads, dropout=c.dropout,
                             dtype=self.dtype, remat=c.checkpointing,
                             attn_dropout=c.attn_dropout,
                             flash_causal=c.flash_attention,
                             fused_decode=c.fused_decode,
                             decode_spmd=c.decode_spmd)
        self.final_norm = nn.LayerNorm(epsilon=1e-5)
        self.text_head = nn.Dense(c.number_text_tokens + 1)
        self.mel_head = nn.Dense(c.number_mel_codes)

    # ------------------------------------------------------------------ utils

    def _set_mel_padding(self, mel_codes, wav_lengths):
        """Replace padding positions with stop tokens (model.py:402-414)."""
        mel_lengths = wav_lengths // self.mel_length_compression
        pos = jnp.arange(mel_codes.shape[1])[None, :]
        return jnp.where(
            pos >= (mel_lengths + 1)[:, None], self.cfg.stop_mel_token, mel_codes
        )

    @staticmethod
    def _aligned(x, start, stop):
        """inp=[start; x], tar=[x; stop] (model.py:397-401)."""
        inp = jnp.pad(x, ((0, 0), (1, 0)), constant_values=start)
        tar = jnp.pad(x, ((0, 0), (0, 1)), constant_values=stop)
        return inp, tar

    def _embed_text(self, text_inputs):
        t = text_inputs.shape[1]
        return self.text_embedding(text_inputs) + self.text_pos_embedding[:t][None]

    def _embed_mel(self, mel_codes):
        t = mel_codes.shape[1]
        return self.mel_embedding(mel_codes) + self.mel_pos_embedding[:t][None]

    # --------------------------------------------------------------- training

    def __call__(self, text_inputs, text_lengths, mel_codes, wav_lengths,
                 return_latent: bool = False, deterministic: bool = True):
        """Training forward (model.py:453-511). Static shapes: callers pad to
        bucket sizes on host; `clip_inputs` is a host-side concern.

        Returns (loss_text, loss_mel, mel_logits) or the mel latent when
        return_latent (the diffusion conditioning signal)."""
        c = self.cfg
        mel_codes = self._set_mel_padding(mel_codes, wav_lengths)
        text_inputs = jnp.pad(
            text_inputs, ((0, 0), (0, 1)), constant_values=c.stop_text_token
        )
        # the reference also stop-rewrites text padding implicitly: dataset
        # pads text with 0 == stop_text_token, so padded positions are stops.
        mel_codes = jnp.pad(
            mel_codes, ((0, 0), (0, 1)), constant_values=c.stop_mel_token
        )
        text_inputs, text_targets = self._aligned(
            text_inputs, c.start_text_token, c.stop_text_token
        )
        mel_codes_in, mel_targets = self._aligned(
            mel_codes, c.start_mel_token, c.stop_mel_token
        )
        text_emb = self._embed_text(text_inputs)
        mel_emb = self._embed_mel(mel_codes_in)

        emb = jnp.concatenate([text_emb, mel_emb], axis=1)
        h, _ = self.gpt(emb, _causal_mask(emb.shape[1]),
                        deterministic=deterministic, causal=True)
        h = self.final_norm(h)
        t_text = text_emb.shape[1]
        h_text, h_mel = h[:, :t_text], h[:, t_text:]

        if return_latent:
            return h_mel[:, :-2]

        text_logits = self.text_head(h_text)
        mel_logits = self.mel_head(h_mel)
        loss_text = _ce(text_logits, text_targets)
        loss_mel = _ce(mel_logits, mel_targets)
        return loss_text, loss_mel, mel_logits

    # -------------------------------------------------------------- inference

    def prefill(self, text_inputs, prompt_codes, max_len: int):
        """Build the prompt, run it once, fill a KV cache of size max_len.

        text_inputs: (B, Lt) int; prompt_codes: (B, Lp) int.
        Returns (cache, last_logits, prefix_len, mel_pos_offset)."""
        c = self.cfg
        text_inputs = jnp.pad(
            text_inputs, ((0, 0), (0, 1)), constant_values=c.stop_text_token
        )
        text_inputs, _ = self._aligned(text_inputs, c.start_text_token, c.stop_text_token)
        text_emb = self._embed_text(text_inputs)
        mel_in = jnp.pad(prompt_codes, ((0, 0), (1, 0)), constant_values=c.start_mel_token)
        mel_emb = self._embed_mel(mel_in)
        emb = jnp.concatenate([text_emb, mel_emb], axis=1)

        b, p, d = emb.shape
        h_heads = c.heads
        dk = d // h_heads
        cache = KVCache(
            k=tuple(jnp.zeros((max_len, dk, h_heads * b), self.dtype)
                    for _ in range(c.layers)),
            v=tuple(jnp.zeros((max_len, dk, h_heads * b), self.dtype)
                    for _ in range(c.layers)),
        )
        # prefix attends causally within itself; blocks attend over the
        # fresh prefix K/V only (rows past the prefix are never read)
        mask = _causal_mask(p)
        h, cache = self.gpt(emb, mask, cache, 0, deterministic=True)
        h = self.final_norm(h[:, -1:])
        logits = self.mel_head(h)[:, 0]
        return cache, logits, p, mel_in.shape[1]

    def decode_one(self, token, cache: KVCache, position, mel_position, max_len: int):
        """One incremental decode step at absolute `position` (mel-segment
        position `mel_position`). Returns (logits, new_cache)."""
        emb = self.mel_embedding(token[:, None]) + jax.lax.dynamic_slice_in_dim(
            self.mel_pos_embedding, mel_position, 1, axis=0
        )[None]
        # rows > position are masked inside decode_attention — no mask needed
        h, cache = self.gpt(emb, None, cache, position, deterministic=True)
        h = self.final_norm(h)
        return self.mel_head(h)[:, 0], cache


def _ce(logits, targets):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    """Store matmul weights in bf16 to halve HBM reads during the
    bandwidth-bound decode; LayerNorms and output heads stay f32."""
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    out = {}
    for k, v in flat.items():
        path = "/".join(k)
        # every normalization flavour across the model zoo (LayerNorm,
        # GroupNorm(32), final_norm, ...) plus output heads
        keep = "norm" in path.lower() or "head" in path
        out[k] = v if keep else v.astype(dtype)
    new = dict(params)
    new["params"] = flax.traverse_util.unflatten_dict(out)
    return new


# ---------------------------------------------------------------------------
# jitted generation loop (replaces HF generate: model.py:533-562)
# ---------------------------------------------------------------------------


def inference_speech(
    model: UnifiedVoice,
    params,
    text_inputs: jax.Array,
    prompt_codes: jax.Array,
    key: jax.Array,
    max_generate_length: int,
    sampling: SamplingParams = SamplingParams(),
    early_stop: bool = True,
    tp_shards: int = 1,
):
    """Autoregressive mel-code generation as one compiled loop.

    text_inputs (B, Lt), prompt_codes (B, Lp) → codes (B, max_generate_length)
    padded with stop_mel_token after each sequence's stop. Compiles per
    (Lt, Lp, max_generate_length) bucket. With `early_stop`, the loop is a
    lax.while_loop that exits once every sequence has emitted stop_mel_token —
    real utterances are usually much shorter than the bucket, so this skips
    the tail steps the reference's HF `generate` also skips."""
    c = model.cfg
    prefix_len = text_inputs.shape[1] + 2 + prompt_codes.shape[1] + 1
    max_len = prefix_len + max_generate_length
    b = text_inputs.shape[0]

    # Fused-kernel eligibility shaping (ops/pallas/decode_attention.py):
    #  * round the cache length up so a Pallas block divides it — rows past
    #    the live position are masked inside the kernel, never read into the
    #    softmax, so the padding is exact;
    #  * pad the batch until heads*B is a multiple of the 128-lane width
    #    (decode is cache-bandwidth-bound; at B=8,H=8 the padded kernel still
    #    measures ~2.5× faster than the un-padded XLA fallback). Padded rows
    #    start `done`, so they emit stop tokens and never delay early exit.
    # `tp_shards` (> 1 when serving with decode_spmd under a TP mesh) scales
    # the lane-alignment requirement: each shard holds heads*B/tp columns of
    # the packed cache, and the kernel engages per-shard only when THAT is a
    # multiple of 128.
    pad_b = 0
    tp = max(1, int(tp_shards))
    if (c.fused_decode or c.decode_spmd) and jax.default_backend() == "tpu":
        max_len = -(-max_len // 128) * 128
        lanes = 128 * tp
        # exact alignment: the smallest B' ≥ b with heads*B' % (128*tp) == 0
        # is the next multiple of lanes/gcd(heads, lanes). Decode is cache-
        # bandwidth-bound (padding multiplies cache traffic), so engage the
        # pad only when B' ≤ 4×b (measured: at B=8,H=8 a 2× pad still runs
        # ~2.5× faster than the un-padded XLA fallback); past that — e.g.
        # B=1, H=16, tp=4 needs B'=32 — the per-shard XLA path is the
        # EXPECTED outcome, not a silent surprise: a 32× wider cache read
        # would cost more than the kernel saves.
        step = lanes // math.gcd(c.heads, lanes)
        b_aligned = -(-b // step) * step
        pad_b = b_aligned - b if b_aligned <= 4 * b else 0
    if pad_b:
        text_inputs = jnp.concatenate(
            [text_inputs,
             jnp.broadcast_to(text_inputs[:1], (pad_b,) + text_inputs.shape[1:])])
        prompt_codes = jnp.concatenate(
            [prompt_codes,
             jnp.broadcast_to(prompt_codes[:1], (pad_b,) + prompt_codes.shape[1:])])

    cache, logits, p, mel_off = model.apply(
        params, text_inputs, prompt_codes, max_len, method=model.prefill
    )
    b_all = b + pad_b

    # per-vocab "already generated" counts for the repetition penalty
    counts = jnp.zeros((b_all, c.number_mel_codes), jnp.int32)
    counts = counts + jax.vmap(
        lambda pc: jnp.zeros((c.number_mel_codes,), jnp.int32).at[pc].add(1)
    )(prompt_codes)

    # ONE vectorized split outside the loop: a jax.random.split inside the
    # decode loop costs ~145 us/step on TPU — more than the whole 6-layer
    # transformer step (~96 us). Pre-splitting moves the threefry work into
    # a single batched kernel before the loop.
    step_keys = jax.random.split(key, max_generate_length)

    def step_core(i, sk, cache, logits, counts, done):
        tok = sample_logits(sk, logits, counts, sampling)
        tok = jnp.where(done, c.stop_mel_token, tok)
        done = done | (tok == c.stop_mel_token)
        counts = counts.at[jnp.arange(b_all), tok].add(1)
        logits, new_cache = model.apply(
            params, tok, cache, prefix_len + i, mel_off + i, max_len,
            method=model.decode_one,
        )
        return tok, new_cache, logits, counts, done

    done0 = jnp.arange(b_all) >= b  # padded rows are born finished
    if early_stop:
        tokens0 = jnp.full((b_all, max_generate_length), c.stop_mel_token,
                           jnp.int32)

        def cond(carry):
            i, _, _, _, done, _ = carry
            return (i < max_generate_length) & ~jnp.all(done)

        def body(carry):
            i, cache, logits, counts, done, tokens = carry
            tok, cache, logits, counts, done = step_core(
                i, step_keys[i], cache, logits, counts, done
            )
            tokens = jax.lax.dynamic_update_slice_in_dim(
                tokens, tok[:, None].astype(jnp.int32), i, axis=1
            )
            return (i + 1, cache, logits, counts, done, tokens)

        carry = (jnp.int32(0), cache, logits, counts, done0, tokens0)
        _, _, _, _, _, tokens = jax.lax.while_loop(cond, body, carry)
        return tokens[:b]

    def step(carry, xs):
        i, sk = xs
        cache, logits, counts, done = carry
        tok, cache, logits, counts, done = step_core(
            i, sk, cache, logits, counts, done
        )
        return (cache, logits, counts, done), tok

    (_, _, _, done), tokens = jax.lax.scan(
        step, (cache, logits, counts, done0),
        (jnp.arange(max_generate_length), step_keys),
    )
    return jnp.swapaxes(tokens, 0, 1)[:b]  # (B, T)

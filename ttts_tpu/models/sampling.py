"""Logits warpers for AR decoding, jit-safe and static-shape.

HF-semantics ports used by the reference's generate call
(ttts/gpt/model.py:557-562 and api defaults: top_p .8, temperature .8,
repetition_penalty 2.0), plus typical sampling
(ttts/gpt/typical_sampling.py TypicalLogitsWarper)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplingParams(NamedTuple):
    temperature: float = 0.8
    top_p: float = 0.8
    top_k: int = 0  # 0 = disabled
    repetition_penalty: float = 2.0
    typical_sampling: bool = False
    typical_mass: float = 0.9


def apply_repetition_penalty(logits: jax.Array, counts: jax.Array, penalty: float) -> jax.Array:
    """HF RepetitionPenaltyLogitsProcessor: for seen tokens, logit>0 → /p,
    logit<0 → *p. counts: (B, V) occurrence counts."""
    if penalty == 1.0:
        return logits
    seen = counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def apply_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filtering (HF TopPLogitsWarper, min_tokens_to_keep=1).

    For decode-sized vocabularies this is SORT-FREE: token i is kept iff the
    exclusive probability mass of strictly-greater logits is < top_p, an
    O(V²) broadcast-compare-reduce that XLA fuses into one VPU pass — 4.9 µs
    vs 20.5 µs for the sort formulation at (8, 1026) on v5e, and the biggest
    single cost in the AR sampling step. Equal-valued boundary tokens share
    the same mass, which matches the sort path's `logits >= kept_min` mask
    exactly (verified elementwise on chip, including ties and -inf rows);
    the top-1 token has mass 0 < top_p, so min_tokens_to_keep=1 holds. Large
    vocabularies fall back to the O(V log V) sort."""
    if top_p >= 1.0:
        return logits
    if logits.shape[-1] <= 2048:
        p = jax.nn.softmax(logits, axis=-1)
        gt = logits[..., None, :] > logits[..., :, None]     # (..., V_i, V_j)
        mass = jnp.sum(jnp.where(gt, p[..., None, :], 0.0), -1)
        return jnp.where(mass < top_p, logits, -jnp.inf)
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < top_p; always keep top-1
    keep_sorted = (cum - probs) < top_p
    keep_sorted = keep_sorted.at[..., 0].set(True)
    # threshold logit = smallest kept logit
    kept_min = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits >= kept_min, logits, -jnp.inf)


def apply_top_k(logits: jax.Array, top_k: int) -> jax.Array:
    if top_k <= 0:
        return logits
    kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
    return jnp.where(logits >= kth, logits, -jnp.inf)


def apply_typical(logits: jax.Array, mass: float) -> jax.Array:
    """Typical decoding (Meister et al.): keep tokens whose surprisal is
    closest to the distribution entropy, up to cumulative `mass`
    (typical_sampling.py:5-44 semantics)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    ent = -jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=-1, keepdims=True)
    shifted = jnp.abs(-logp - ent)
    order = jnp.argsort(shifted, axis=-1)  # ascending: most typical first
    sorted_p = jnp.take_along_axis(p, order, axis=-1)
    cum = jnp.cumsum(sorted_p, axis=-1)
    keep_sorted = cum < mass
    keep_sorted = keep_sorted.at[..., 0].set(True)  # min_tokens_to_keep=1
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order
    ].set(keep_sorted)
    return jnp.where(keep, logits, -jnp.inf)


def sample_logits(key: jax.Array, logits: jax.Array, counts: jax.Array,
                  params: SamplingParams) -> jax.Array:
    """Warp logits (repetition → temperature → top-k → top-p/typical) and
    sample. logits: (B, V) → tokens (B,). Order matches HF generate."""
    logits = apply_repetition_penalty(logits, counts, params.repetition_penalty)
    if params.temperature != 1.0:
        logits = logits / params.temperature
    if params.typical_sampling:
        logits = apply_typical(logits, params.typical_mass)
    logits = apply_top_k(logits, params.top_k)
    logits = apply_top_p(logits, params.top_p)
    return jax.random.categorical(key, logits, axis=-1)

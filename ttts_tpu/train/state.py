"""Train state + optimizers.

Replaces the reference's HF-Accelerate trainers' torch optimizers
(ttts/gpt/train.py:41-63: AdamW β=(0.9,0.96) wd=0.01, 500-step linear warmup
`warmup:36`, grad-clip 1.0) and the VQVAE GAN's paired Adam optimizers with
exponential lr decay (ttts/vqvae/train.py + config betas (0.8,0.99),
lr_decay 0.999875).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """TrainState carrying extra variable collections (e.g. EMA codebooks)."""

    extra_vars: Any = None
    ema_params: Any = None

    @classmethod
    def create(cls, *, params, ema_params=None, **kwargs):
        # The state is donated into jitted train steps (train/mains.py);
        # a buffer appearing twice in a donated pytree is an XLA error
        # ("Attempt to donate the same buffer twice"). Callers naturally
        # write `ema_params=params` — de-alias here.
        if ema_params is not None:
            p_ids = {id(l) for l in jax.tree_util.tree_leaves(params)}
            if any(id(l) in p_ids
                   for l in jax.tree_util.tree_leaves(ema_params)):
                ema_params = jax.tree_util.tree_map(jnp.copy, ema_params)
        return super().create(params=params, ema_params=ema_params, **kwargs)


def warmup_constant_schedule(lr: float, warmup_steps: int) -> optax.Schedule:
    """min(1, step/warmup) * lr (gpt/train.py warmup:36)."""

    def fn(step):
        return lr * jnp.minimum(1.0, (step + 1) / max(warmup_steps, 1))

    return fn


def exponential_decay_schedule(lr: float, decay: float) -> optax.Schedule:
    """lr * decay^step (vqvae ExponentialLR per epoch; we apply per step with
    a correspondingly gentler decay)."""

    def fn(step):
        return lr * decay**step

    return fn


def make_adamw(lr: float, warmup_steps: int = 500, betas=(0.9, 0.96),
               weight_decay: float = 0.01, grad_clip: float = 1.0,
               eps: float = 1e-8) -> optax.GradientTransformation:
    """AdamW with warmup + clipping (gpt/train.py:48-63)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            warmup_constant_schedule(lr, warmup_steps),
            b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay,
        ),
    )


def make_gan_adam(lr: float, betas=(0.8, 0.99), eps: float = 1e-9,
                  decay: float = 0.999875) -> optax.GradientTransformation:
    """AdamW for the codec GAN (vqvae/config.json train block)."""
    return optax.adamw(
        exponential_decay_schedule(lr, decay), b1=betas[0], b2=betas[1], eps=eps,
        weight_decay=0.01,
    )


def with_accumulation(tx: optax.GradientTransformation,
                      accumulate_num: int) -> optax.GradientTransformation:
    """Gradient accumulation via optax.MultiSteps.

    Reference semantics (ttts/gpt/train.py:99-112, ttts/diffusion/
    train.py:156-195, CLVP bs 24 × accum 5): gradients of loss/N are summed
    over N micro-batches, then clip + optimizer update fire once. MultiSteps
    keeps the running average and applies the inner chain (which includes the
    clip) every N micro-steps — identical math, one jit program."""
    if accumulate_num <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=accumulate_num)


def ema_update(ema_params, new_params, beta: float = 0.999):
    """Shadow-weight EMA (gpt/train.py EMA; update was disabled in the
    reference (:123-124) — enabled here)."""
    return jax.tree_util.tree_map(
        lambda e, p: beta * e + (1.0 - beta) * p, ema_params, new_params
    )

"""Gradient accumulation (optax.MultiSteps) equivalence.

The reference accumulates grad(loss/N) over N micro-batches and then
clips+steps once (ttts/gpt/train.py:99-112; CLVP runs bs 24 × accum 5).
with_accumulation must reproduce the big-batch update: N micro-steps over
batch shards == one step over the full batch, numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from ttts_tpu.config import GPTConfig
from ttts_tpu.models.gpt import UnifiedVoice
from ttts_tpu.train.state import TrainState, make_adamw, with_accumulation
from ttts_tpu.train.steps import gpt_train_step


def _batch(rng, b, lt, lm):
    return {
        "text": jnp.asarray(rng.integers(1, 200, size=(b, lt))),
        "text_lengths": jnp.asarray([lt] * b),
        "mel_codes": jnp.asarray(rng.integers(0, 1024, size=(b, lm))),
        "wav_lengths": jnp.asarray(rng.integers(4, lm + 1, size=(b,))) * 1024,
    }


def test_two_microsteps_equal_one_big_step():
    # dropout off: exact equivalence needs a deterministic loss
    cfg = GPTConfig(model_dim=64, layers=2, heads=4, max_text_tokens=16,
                    max_mel_tokens=32, dropout=0.0)
    model = UnifiedVoice(cfg)
    rng = np.random.default_rng(0)
    big = _batch(rng, 4, 10, 12)
    micro = [
        {k: v[:2] for k, v in big.items()},
        {k: v[2:] for k, v in big.items()},
    ]
    params = model.init(jax.random.key(0), big["text"], big["text_lengths"],
                        big["mel_codes"], big["wav_lengths"])
    key = jax.random.key(7)
    step = jax.jit(lambda s, b, k: gpt_train_step(s, b, k, model))

    ref_state = TrainState.create(apply_fn=model.apply, params=params,
                                  tx=make_adamw(1e-3, warmup_steps=1))
    ref_state, _ = step(ref_state, big, key)

    acc_state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=with_accumulation(make_adamw(1e-3, warmup_steps=1), 2),
    )
    acc_state, _ = step(acc_state, micro[0], key)
    # params must be UNCHANGED until the final micro-step
    mid = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        acc_state.params, params)
    assert all(jax.tree_util.tree_leaves(mid))
    acc_state, _ = step(acc_state, micro[1], key)

    flat_ref = jax.tree_util.tree_leaves(ref_state.params)
    flat_acc = jax.tree_util.tree_leaves(acc_state.params)
    for a, b in zip(flat_acc, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=5e-4)


def test_ema_advances_once_per_optimizer_update():
    """Under MultiSteps, EMA shadow weights must decay once per REAL update,
    not once per micro-step (beta^N compounding would shorten the EMA time
    constant N×)."""
    cfg = GPTConfig(model_dim=64, layers=1, heads=4, max_text_tokens=16,
                    max_mel_tokens=32, dropout=0.0)
    model = UnifiedVoice(cfg)
    rng = np.random.default_rng(1)
    big = _batch(rng, 4, 10, 12)
    micro = [{k: v[:2] for k, v in big.items()},
             {k: v[2:] for k, v in big.items()}]
    params = model.init(jax.random.key(0), big["text"], big["text_lengths"],
                        big["mel_codes"], big["wav_lengths"])
    key = jax.random.key(7)
    step = jax.jit(lambda s, b, k: gpt_train_step(s, b, k, model))

    ref = TrainState.create(apply_fn=model.apply, params=params,
                            tx=make_adamw(1e-3, warmup_steps=1),
                            ema_params=params)
    ref, _ = step(ref, big, key)

    acc = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=with_accumulation(make_adamw(1e-3, warmup_steps=1), 2),
        ema_params=params,
    )
    acc, _ = step(acc, micro[0], key)
    # no optimizer update yet → EMA untouched
    same = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        acc.ema_params, params)
    assert all(jax.tree_util.tree_leaves(same))
    acc, _ = step(acc, micro[1], key)

    for a, b in zip(jax.tree_util.tree_leaves(acc.ema_params),
                    jax.tree_util.tree_leaves(ref.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_donated_state_with_aliased_ema_params():
    """train/mains.py donates the state into the jitted step; a caller
    passing `ema_params=params` must not produce a duplicate-donation
    error (TrainState.create de-aliases — state.py)."""
    cfg = GPTConfig(model_dim=32, layers=1, heads=2, max_text_tokens=16,
                    max_mel_tokens=32, dropout=0.0)
    model = UnifiedVoice(cfg)
    rng = np.random.default_rng(1)
    batch = _batch(rng, 2, 10, 12)
    params = model.init(jax.random.key(0), batch["text"],
                        batch["text_lengths"], batch["mel_codes"],
                        batch["wav_lengths"])
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_adamw(1e-3, warmup_steps=1),
                              ema_params=params)
    assert all(
        a is not b for a, b in zip(jax.tree_util.tree_leaves(state.params),
                                   jax.tree_util.tree_leaves(state.ema_params)))
    step = jax.jit(lambda s, b, k: gpt_train_step(s, b, k, model),
                   donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.key(7))
    state, metrics = step(state, batch, jax.random.key(8))
    assert np.isfinite(float(metrics["loss"]))

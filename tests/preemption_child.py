"""Subprocess body for test_trainer.py::test_preemption_grace_save.

Runs a tiny GPT Trainer with a throttled batch stream, prints READY once the
train loop is underway, and waits to be SIGTERMed by the parent. The
Trainer's preemption handler must flush a final Orbax checkpoint and raise
PreemptionRequested; we report the flushed step on stdout and exit 0.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ttts_tpu.config import GPTConfig
from ttts_tpu.models.gpt import UnifiedVoice
from ttts_tpu.train.state import TrainState, make_adamw
from ttts_tpu.train.steps import gpt_train_step
from ttts_tpu.train.trainer import PreemptionRequested, Trainer

TINY = GPTConfig(model_dim=32, layers=1, heads=2, max_text_tokens=32,
                 max_mel_tokens=48, number_mel_codes=34, start_mel_token=32,
                 stop_mel_token=33)


def _batches(rng, n, ready_at):
    for i in range(n):
        if i == ready_at:
            print("READY", flush=True)
        if i >= ready_at:
            time.sleep(0.25)  # give the parent's SIGTERM a window
        yield {
            "text": rng.integers(1, 100, size=(2, 8)).astype(np.int32),
            "text_lengths": np.asarray([8, 6], np.int32),
            "mel_codes": rng.integers(0, 32, size=(2, 12)).astype(np.int32),
            "wav_lengths": np.asarray([12, 10], np.int32) * 1024,
        }


def main():
    logs = pathlib.Path(sys.argv[1])
    rng = np.random.default_rng(0)
    model = UnifiedVoice(TINY)
    b0 = {
        "text": rng.integers(1, 100, size=(2, 8)).astype(np.int32),
        "text_lengths": np.asarray([8, 6], np.int32),
        "mel_codes": rng.integers(0, 32, size=(2, 12)).astype(np.int32),
        "wav_lengths": np.asarray([12, 10], np.int32) * 1024,
    }
    params = model.init(jax.random.key(0), jnp.asarray(b0["text"]),
                        jnp.asarray(b0["text_lengths"]),
                        jnp.asarray(b0["mel_codes"]),
                        jnp.asarray(b0["wav_lengths"]))
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_adamw(1e-3, warmup_steps=1))
    step = jax.jit(lambda s, b, k: gpt_train_step(s, b, k, model))
    # save_freq=1000 >> train_steps: any checkpoint present after SIGTERM can
    # only have come from the preemption flush, not the periodic cadence.
    # pass the generator LAZILY (a list() would run the sleeps/READY upfront)
    trainer = Trainer(step, state, _batches(rng, 400, ready_at=2),
                      logs, train_steps=400, save_freq=1000, log_every=50)
    try:
        trainer.train()
    except PreemptionRequested:
        print(f"FLUSHED step={trainer.ckpt.latest_step()}", flush=True)
        return 0
    print("NO_PREEMPTION", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())

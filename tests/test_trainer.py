"""Trainer loop + checkpointing integration tests."""

import functools
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttts_tpu.config import GPTConfig
from ttts_tpu.data.datasets import GptTtsDataset
from ttts_tpu.data.manifest import save_sidecar, write_manifest
from ttts_tpu.models.gpt import UnifiedVoice
from ttts_tpu.train.checkpoints import CheckpointManager, export_release, load_release
from ttts_tpu.train.state import TrainState, make_adamw
from ttts_tpu.train.steps import gpt_train_step
from ttts_tpu.train.trainer import Trainer

TINY = GPTConfig(model_dim=32, layers=1, heads=2, max_text_tokens=32,
                 max_mel_tokens=48, number_mel_codes=34, start_mel_token=32,
                 stop_mel_token=33)


def _batches(rng, n):
    for _ in range(n):
        yield {
            "text": rng.integers(1, 100, size=(2, 8)).astype(np.int32),
            "text_lengths": np.asarray([8, 6], np.int32),
            "mel_codes": rng.integers(0, 32, size=(2, 12)).astype(np.int32),
            "wav_lengths": np.asarray([12, 10], np.int32) * 1024,
        }


class TestTrainer:
    def test_train_checkpoint_resume(self, tmp_path):
        rng = np.random.default_rng(0)
        model = UnifiedVoice(TINY)
        b0 = next(_batches(rng, 1))
        params = model.init(jax.random.key(0), jnp.asarray(b0["text"]),
                            jnp.asarray(b0["text_lengths"]),
                            jnp.asarray(b0["mel_codes"]),
                            jnp.asarray(b0["wav_lengths"]))
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  tx=make_adamw(1e-3, warmup_steps=1))
        step = jax.jit(lambda s, b, k: gpt_train_step(s, b, k, model))
        trainer = Trainer(step, state, list(_batches(rng, 8)),
                          tmp_path / "logs", train_steps=6, save_freq=3,
                          log_every=2)
        final = trainer.train()
        assert int(final.step) == 6
        assert trainer.ckpt.latest_step() == 6

        # fresh trainer resumes from step 6
        t2 = Trainer(step, state, list(_batches(rng, 8)), tmp_path / "logs",
                     train_steps=6, save_freq=3)
        t2.maybe_resume()
        assert t2.step == 6
        assert int(t2.state.step) == 6


class TestRelease:
    def test_export_and_load_release(self, tmp_path, rng):
        params = {
            "params": {
                "dec": {"kernel": rng.standard_normal((4, 4)).astype(np.float32)},
                "enc_q": {"kernel": rng.standard_normal((4, 4)).astype(np.float32)},
            }
        }
        path = tmp_path / "release.npz"
        export_release(params, path, drop_prefixes=("enc_q",), config={"v": 2})
        tree, cfg = load_release(path)
        assert cfg == {"v": 2}
        assert "dec" in tree["params"] and "enc_q" not in tree["params"]
        # fp16 round trip within half precision
        np.testing.assert_allclose(tree["params"]["dec"]["kernel"],
                                   params["params"]["dec"]["kernel"], atol=2e-3)


class TestDivergenceAbort:
    def test_consecutive_nonfinite_aborts_with_checkpoint(self, tmp_path):
        """SURVEY §5.3: an unbroken run of skipped (non-finite) steps aborts
        loudly with the state checkpointed, instead of silently no-op'ing
        through the remaining budget."""
        import jax.numpy as jnp
        import pytest

        class S:  # minimal checkpointable state
            pass

        state = {"w": jnp.zeros((2,))}

        def bad_step(state, batch, key):
            return state, {"loss": jnp.nan, "nonfinite_skipped": jnp.asarray(1.0)}

        trainer = Trainer(bad_step, state, [{"x": np.zeros((1,))}] * 100,
                          tmp_path / "logs", train_steps=100, save_freq=1000,
                          log_every=1000, max_consecutive_nonfinite=5)
        with pytest.raises(RuntimeError, match="consecutive"):
            trainer.train()
        # flags are evaluated one step late (dispatch/run-ahead overlap), so
        # the 5th consecutive skip aborts after step 6 was dispatched
        assert trainer.step == 6
        assert trainer.ckpt.latest_step() == 6  # last state was saved

    def test_recovered_steps_reset_the_counter(self, tmp_path):
        import jax.numpy as jnp

        calls = {"n": 0}

        def flaky_step(state, batch, key):
            calls["n"] += 1
            bad = calls["n"] % 3 == 0  # never 5 consecutive
            return state, {"nonfinite_skipped": jnp.asarray(1.0 if bad else 0.0)}

        trainer = Trainer(flaky_step, {"w": jnp.zeros((2,))},
                          [{"x": np.zeros((1,))}] * 30, tmp_path / "logs",
                          train_steps=30, save_freq=1000, log_every=1000,
                          max_consecutive_nonfinite=5)
        trainer.train()  # completes without raising
        assert trainer.step == 30


@pytest.mark.slow
def test_preemption_grace_save(tmp_path):
    """SIGTERM to a running trainer flushes a final Orbax checkpoint before
    exit (VERDICT r4 §8; SURVEY §5.3 — the reference has no preemption
    handling and loses everything since its last manual save).

    A subprocess trainer (tests/preemption_child.py) runs with save_freq >>
    train_steps so NO periodic save can fire; we SIGTERM it mid-loop and
    assert (a) it exits 0 via PreemptionRequested, (b) a checkpoint exists,
    (c) the checkpoint step matches the flushed step it reported."""
    import re
    import signal
    import subprocess
    import sys as _sys

    child = pathlib.Path(__file__).parent / "preemption_child.py"
    logs = tmp_path / "logs"
    proc = subprocess.Popen([_sys.executable, str(child), str(logs)],
                            stdout=subprocess.PIPE, text=True, bufsize=1)
    try:
        for line in proc.stdout:
            if line.strip() == "READY":
                break
        else:
            raise AssertionError("child exited before READY")
        proc.send_signal(signal.SIGTERM)
        out = proc.stdout.read()
        rc = proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, f"child rc={rc}, out={out!r}"
    m = re.search(r"FLUSHED step=(\d+)", out)
    assert m, f"no FLUSHED line in {out!r}"
    mgr = CheckpointManager(logs / "ckpt")
    assert mgr.latest_step() == int(m.group(1)) and mgr.latest_step() >= 1

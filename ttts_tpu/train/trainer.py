"""Generic training loop + per-model trainers.

One `Trainer` replaces the five copy-pasted Accelerate loops of the reference
(ttts/gpt/train.py:41-146, ttts/diffusion/train.py:78-263, ttts/clvp/train.py,
ttts/classifier/train.py, and the mp.spawn GAN loop ttts/vqvae/train.py):
cycle a host data iterator, run the jitted step, log scalars every
`log_every`, rotate Orbax checkpoints keep-N every `save_freq`, auto-resume
from the latest checkpoint on start (the failure-recovery story the reference
left manual — SURVEY §5.3/5.4).

Data parallelism: batches are device_put with a batch sharding over the mesh;
the jitted step's gradient mean is the implicit XLA collective.
"""

from __future__ import annotations

import itertools
import pathlib
import time
from typing import Callable, Dict, Iterable, Iterator, Optional

import jax
import numpy as np

from ttts_tpu.parallel import data_axis_size, make_mesh, replicate, shard_batch
from ttts_tpu.train.checkpoints import CheckpointManager
from ttts_tpu.utils.logging import SummaryWriter, get_logger


class _NullWriter:
    """TensorBoard sink for non-primary processes."""

    def summarize(self, *a, **kw):
        pass

    def close(self):
        pass


class PreemptionRequested(Exception):
    """Raised inside Trainer.train after a SIGTERM-triggered final save."""


class Trainer:
    """Drives (state, batch, key) -> (state, metrics) steps."""

    def __init__(
        self,
        step_fn: Callable,
        state,
        data_iter: Iterable,
        logs_folder: str,
        train_steps: int,
        save_freq: int = 1000,
        keep_ckpts: int = 3,
        log_every: int = 100,
        seed: int = 1234,
        mesh=None,
        eval_fn: Optional[Callable] = None,
        eval_freq: Optional[int] = None,
        max_consecutive_nonfinite: int = 25,
    ):
        self.step_fn = step_fn
        self.state = state
        self.data_iter = data_iter
        self.train_steps = train_steps
        self.save_freq = save_freq
        self.log_every = log_every
        self.eval_fn = eval_fn
        self.eval_freq = eval_freq or save_freq
        self.mesh = mesh
        self.logs_folder = pathlib.Path(logs_folder)
        # multi-host: only process 0 writes TensorBoard events / runs eval
        # hooks; every process participates in Orbax saves (collective — the
        # manager coordinates shard writes and process-0 metadata). Log files
        # are per-process so a shared logs dir doesn't interleave.
        from ttts_tpu.parallel import is_primary

        self._primary = is_primary()
        self.writer = (SummaryWriter(self.logs_folder / "tb")
                       if self._primary else _NullWriter())
        self.ckpt = CheckpointManager(self.logs_folder / "ckpt", keep=keep_ckpts)
        log_name = ("train.log" if self._primary
                    else f"train.p{jax.process_index()}.log")
        self.logger = get_logger("trainer", str(self.logs_folder / log_name))
        self.key = jax.random.key(seed)
        self.step = 0
        # failure detection (SURVEY §5.3): apply_gradients_safe skips
        # non-finite steps in-jit; a long unbroken run of skips means the
        # model has diverged and "training" is a no-op — abort loudly
        # instead of burning the remaining step budget.
        self.max_consecutive_nonfinite = max_consecutive_nonfinite
        self._nonfinite_run = 0

    def _install_preemption_handler(self):
        """SIGTERM → set a flag; the train loop flushes a final Orbax save at
        the top of the next step and raises PreemptionRequested. Installed
        only on the main thread (signal.signal raises elsewhere — e.g. when
        a Trainer runs inside a test worker thread); the previous handler is
        chained so embedding applications keep their own shutdown logic."""
        self._preempted = False
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return
        prev = signal.getsignal(signal.SIGTERM)

        def handler(signum, frame):
            self._preempted = True
            if callable(prev) and prev not in (signal.SIG_IGN, signal.SIG_DFL):
                prev(signum, frame)

        signal.signal(signal.SIGTERM, handler)

    def maybe_resume(self):
        """Auto-resume from the latest checkpoint (replaces the reference's
        edit-__main__-to-load workflow, gpt/train.py:144)."""
        latest = self.ckpt.latest_step()
        if latest is not None:
            _, self.state = self.ckpt.restore(latest, template=self.state)
            self.step = latest
            # fold the resumed step into the PRNG stream — otherwise a resumed
            # run replays the exact per-step keys of steps 1..N for N+1..2N
            self.key = jax.random.fold_in(self.key, latest)
            self.logger.info("resumed from step %d", latest)

    def _put(self, batch: Dict[str, np.ndarray]):
        if self.mesh is None:
            return {k: jax.numpy.asarray(v) for k, v in batch.items()}
        if jax.process_count() > 1:
            # multi-host: each process holds only ITS sampler shard (the
            # rank-strided bucket slice) — assemble the global array from
            # process-local data. Shapes must be identical across processes
            # (the bucket sampler emits fixed-size batches per rank); a
            # replicated fallback would silently run different programs per
            # process, so divisibility is asserted instead.
            out = {}
            for k, v in batch.items():
                v = np.asarray(v)
                sh = shard_batch(self.mesh, v.ndim)
                n_local = data_axis_size(self.mesh) // jax.process_count()
                assert v.shape[0] % max(n_local, 1) == 0, (
                    f"multi-host batch '{k}' local leading dim {v.shape[0]} "
                    f"must divide the {n_local} local data-axis shards")
                out[k] = jax.make_array_from_process_local_data(sh, v)
            return out
        # collaters drop failed examples (gpt/dataset.py:49-51 semantics), so
        # a batch can arrive smaller than batch_size; when the leading dim
        # doesn't divide the data axis, fall back to replicated placement —
        # GSPMD still runs the program correctly, just unsharded.
        n_data = data_axis_size(self.mesh)
        return {
            k: (jax.device_put(v, shard_batch(self.mesh, np.ndim(v)))
                if np.shape(v) and np.shape(v)[0] % n_data == 0
                else jax.numpy.asarray(v))
            for k, v in batch.items()
        }

    def _note_skip(self, skipped: float):
        self._nonfinite_run = self._nonfinite_run + 1 if skipped > 0 else 0
        if self._nonfinite_run >= self.max_consecutive_nonfinite:
            # the save_freq branch may already have checkpointed this exact
            # step — Orbax raises on duplicate steps, which would mask the
            # diverged-model RuntimeError below; never let the save win.
            if self.ckpt.latest_step() != self.step:
                try:
                    self.ckpt.save(self.step, self.state, wait=True)
                except Exception:
                    self.logger.exception("divergence-abort checkpoint failed")
            raise RuntimeError(
                f"aborting: {self._nonfinite_run} consecutive "
                "non-finite-gradient steps (model diverged); last "
                f"good state checkpointed at step {self.step}"
            )

    def train(self):
        it = iter(self.data_iter)
        t0 = time.perf_counter()
        pending_skip = None  # previous step's device-side flag
        self._install_preemption_handler()
        while self.step < self.train_steps:
            if self._preempted:
                # preemption grace (SURVEY §5.3 — absent in the reference,
                # which loses everything since its last manual save): flush
                # a final synchronous checkpoint, then surface the stop.
                self.logger.info(
                    "SIGTERM received — flushing checkpoint at step %d",
                    self.step)
                if self.ckpt.latest_step() != self.step:
                    self.ckpt.save(self.step, self.state, wait=True)
                raise PreemptionRequested(
                    f"preempted at step {self.step}; checkpoint flushed")
            try:
                batch = next(it)
            except StopIteration:
                it = iter(self.data_iter)
                batch = next(it)
            if batch is None:  # empty collated batch — skip (gpt/train.py:101)
                continue
            self.key, sk = jax.random.split(self.key)
            self.state, metrics = self.step_fn(self.state, self._put(batch), sk)
            self.step += 1

            # check the PREVIOUS step's non-finite flag now: the current step
            # is already dispatched, so this host fetch overlaps with its
            # execution instead of serializing dispatch (one-step run-ahead;
            # float() per step before dispatch cost a tunnel round trip each)
            if pending_skip is not None:
                self._note_skip(float(pending_skip))
            pending_skip = metrics.get("nonfinite_skipped")

            if self.step % self.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                metrics["steps_per_sec"] = self.log_every / dt
                self.writer.summarize(self.step, scalars=metrics)
                self.logger.info("step %d %s", self.step, metrics)
            if self.step % self.save_freq == 0:
                # async: Orbax writes in the background while training
                # continues; the final save below (and close()) finalizes
                self.ckpt.save(self.step, self.state, wait=False)
            if self.eval_fn is not None and self.step % self.eval_freq == 0:
                self.eval_fn(self.step, self.state, self.writer)
        if pending_skip is not None:
            self._note_skip(float(pending_skip))
        self.ckpt.save(self.step, self.state, wait=True)
        return self.state

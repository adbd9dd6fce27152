"""Multi-host bootstrap: 2 real processes, one global mesh, one sharded step.

The reference's multi-process story is mp.spawn + NCCL process groups
(ttts/vqvae/train.py:44-60,127-132). Here (SURVEY §5.8) it is
`parallel.initialize_distributed` → `jax.distributed.initialize`: the test
launches two subprocesses with 2 virtual CPU devices each, joins them into a
4-device runtime, builds a (4, 1) data mesh spanning both, assembles the
global batch from process-local sampler shards (Trainer._put), runs one
sharded GPT train step — and asserts the GLOBAL loss equals a single-process
run of the same step on the same batch.
"""

import pathlib
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
CHILD = REPO / "tests" / "multihost_child.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference() -> tuple:
    """The same step, unsharded, in this process (same seeds as the child)."""
    from ttts_tpu.config import GPTConfig
    from ttts_tpu.models.gpt import UnifiedVoice
    from ttts_tpu.train.state import TrainState, make_adamw
    from ttts_tpu.train.steps import gpt_train_step

    cfg = GPTConfig(model_dim=32, layers=1, heads=2, max_text_tokens=16,
                    max_mel_tokens=24, number_mel_codes=34, start_mel_token=32,
                    stop_mel_token=33)
    model = UnifiedVoice(cfg)
    rng = np.random.default_rng(0)
    gbatch = {
        "text": jnp.asarray(rng.integers(1, 100, size=(4, 8))),
        "text_lengths": jnp.asarray([8, 6, 8, 5]),
        "mel_codes": jnp.asarray(rng.integers(0, 32, size=(4, 12))),
        "wav_lengths": jnp.asarray([12, 10, 8, 12]) * 1024,
    }
    params = model.init(jax.random.key(0), gbatch["text"][:1],
                        gbatch["text_lengths"][:1], gbatch["mel_codes"][:1],
                        gbatch["wav_lengths"][:1])
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_adamw(1e-3, warmup_steps=1))
    step = jax.jit(lambda s, b, k: gpt_train_step(s, b, k, model))
    _, metrics = step(state, gbatch, jax.random.key(7))
    return float(metrics["loss"]), float(metrics["grad_norm"])


@pytest.mark.heavy
def test_two_process_global_mesh_step(tmp_path):
    port = _free_port()
    env_base = dict(__import__("os").environ)
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(CHILD), str(rank), str(port), str(tmp_path)],
            env=env_base, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=str(REPO)))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {rank} failed:\n{out[-4000:]}"

    loss_mp, gnorm_mp = map(
        float, (tmp_path / "loss.txt").read_text().split())
    loss_sp, gnorm_sp = _single_process_reference()
    # global-batch loss must match the unsharded single-process step
    np.testing.assert_allclose(loss_mp, loss_sp, rtol=2e-5)
    np.testing.assert_allclose(gnorm_mp, gnorm_sp, rtol=2e-4)

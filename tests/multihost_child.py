"""Child process for tests/test_multihost.py: one of two JAX processes.

Usage: python tests/multihost_child.py <rank> <port> <outdir>

Each process owns 2 virtual CPU devices; `initialize_distributed` joins them
into one 4-device runtime (the jax.distributed analogue of the reference's
`mp.spawn` + `dist.init_process_group(init_method='env://')`,
ttts/vqvae/train.py:44-60,127-132). The global mesh spans both processes;
each process holds only its half of the global batch and the Trainer
assembles global arrays from process-local data, runs ONE sharded GPT step,
and writes the global loss (process 0) for the parent to compare against a
single-process run.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    rank, port, outdir = int(sys.argv[1]), sys.argv[2], pathlib.Path(sys.argv[3])

    from ttts_tpu.parallel import initialize_distributed, is_primary, make_mesh

    pid, nprocs = initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=rank)
    assert (pid, nprocs) == (rank, 2), (pid, nprocs)
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 4, jax.device_count()
    # idempotent
    assert initialize_distributed() == (rank, 2)
    assert is_primary() == (rank == 0)

    from ttts_tpu.config import GPTConfig, MeshConfig
    from ttts_tpu.models.gpt import UnifiedVoice
    from ttts_tpu.parallel import replicate, with_sharding
    from ttts_tpu.train.state import TrainState, make_adamw
    from ttts_tpu.train.steps import gpt_train_step
    from ttts_tpu.train.trainer import Trainer

    mesh = make_mesh(MeshConfig())  # data = -1 -> (4, 1) over both processes
    assert mesh.devices.size == 4

    cfg = GPTConfig(model_dim=32, layers=1, heads=2, max_text_tokens=16,
                    max_mel_tokens=24, number_mel_codes=34, start_mel_token=32,
                    stop_mel_token=33)
    model = UnifiedVoice(cfg)

    rng = np.random.default_rng(0)
    gbatch = {
        "text": rng.integers(1, 100, size=(4, 8)),
        "text_lengths": np.asarray([8, 6, 8, 5]),
        "mel_codes": rng.integers(0, 32, size=(4, 12)),
        "wav_lengths": np.asarray([12, 10, 8, 12]) * 1024,
    }
    # this process's sampler shard: the 2 rows its local devices will hold
    # (device order on the data axis is process-contiguous)
    local = {k: np.asarray(v)[rank * 2:(rank + 1) * 2] for k, v in gbatch.items()}

    params = model.init(
        jax.random.key(0), jnp.asarray(gbatch["text"][:1]),
        jnp.asarray(gbatch["text_lengths"][:1]),
        jnp.asarray(gbatch["mel_codes"][:1]),
        jnp.asarray(gbatch["wav_lengths"][:1]))
    # identical on every process (same seed) -> replicate over the global mesh
    params = jax.tree_util.tree_map(np.asarray, params)
    params = with_sharding(params, replicate(mesh))
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_adamw(1e-3, warmup_steps=1))
    state = state.replace(step=jax.device_put(state.step, replicate(mesh)),
                          opt_state=with_sharding(
                              jax.tree_util.tree_map(np.asarray, state.opt_state),
                              replicate(mesh)))

    step = jax.jit(lambda s, b, k: gpt_train_step(s, b, k, model))
    trainer = Trainer(step, state, [local], str(outdir / "logs"),
                      train_steps=1, save_freq=10, log_every=1, mesh=mesh)
    # exercise Trainer._put's multi-host branch + the sharded step
    batch = trainer._put(local)
    assert batch["text"].shape == (4, 8), batch["text"].shape  # global shape
    new_state, metrics = step(trainer.state, batch, jax.random.key(7))
    loss = float(metrics["loss"])
    gnorm = float(metrics["grad_norm"])
    if rank == 0:
        (outdir / "loss.txt").write_text(f"{loss!r} {gnorm!r}")
    print(f"[child {rank}] loss={loss} grad_norm={gnorm}", flush=True)


if __name__ == "__main__":
    main()

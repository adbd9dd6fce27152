"""Device mesh construction and sharding helpers.

Replaces the reference's torch.distributed/NCCL + HF-Accelerate plumbing
(ttts/vqvae/train.py:44-60,119-135; ttts/gpt/train.py:43,58) with one JAX
mesh. Data parallelism is batch-axis sharding under jit; gradient mean is the
implicit psum XLA inserts. Tensor-parallel sharding of attention heads / FFN
is the 'model' axis. Axes are laid out so 'model' rides the innermost (ICI-
contiguous) devices and 'data' spans slices (DCN-friendly).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ttts_tpu.config import MeshConfig

_DISTRIBUTED_INITIALIZED = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> tuple:
    """Multi-host process bootstrap: `jax.distributed.initialize` with the
    reference's torch.distributed env conventions mapped in.

    The reference rendezvouses one process per GPU via
    `dist.init_process_group(init_method='env://')` driven by
    MASTER_ADDR/MASTER_PORT + mp.spawn rank/world
    (ttts/vqvae/train.py:44-60,127-132; SURVEY §5.8). The JAX equivalent is
    one `jax.distributed.initialize` per HOST, after which `jax.devices()`
    spans every process and a single mesh/jit program drives the whole fleet.

    Resolution order per field:
      1. explicit arguments;
      2. torch-style env: MASTER_ADDR[:MASTER_PORT], WORLD_SIZE → process
         count, RANK → process id (so reference launch scripts translate
         1:1 — WORLD_SIZE/RANK here count HOSTS, not accelerators);
      3. nothing set → bare `jax.distributed.initialize()`, which
         auto-detects on Cloud TPU pods (the runtime publishes coordinator
         and topology; no rendezvous scripting needed).

    Single-process runs simply never call this (mains only call it when
    --multihost / TTTS_MULTIHOST=1 or WORLD_SIZE>1 says so). Idempotent:
    repeat calls are no-ops. Returns (process_index, process_count)."""
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return jax.process_index(), jax.process_count()
    if coordinator_address is None and "MASTER_ADDR" in os.environ:
        port = os.environ.get("MASTER_PORT", "1234")
        coordinator_address = f"{os.environ['MASTER_ADDR']}:{port}"
    if num_processes is None and "WORLD_SIZE" in os.environ:
        num_processes = int(os.environ["WORLD_SIZE"])
    if process_id is None and "RANK" in os.environ:
        process_id = int(os.environ["RANK"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _DISTRIBUTED_INITIALIZED = True
    return jax.process_index(), jax.process_count()


def multihost_requested() -> bool:
    """True when the environment asks for multi-host bootstrap (mains call
    initialize_distributed() iff this holds, so single-host runs never touch
    the distributed service)."""
    return (os.environ.get("TTTS_MULTIHOST", "0") == "1"
            or int(os.environ.get("WORLD_SIZE", "1")) > 1)


def is_primary() -> bool:
    """Process 0 — the only process that writes TensorBoard events and logs
    (every process still participates in Orbax saves: multihost checkpoint
    writes are collectives that Orbax coordinates, with each process writing
    its addressable shards and process 0 finalizing metadata)."""
    return jax.process_index() == 0


def make_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) — or, with cfg.dcn > 1, (dcn, data, model) —
    mesh over all (or given) devices.

    cfg.data == -1 means "all devices not claimed by other axes". The dcn
    axis is the SLOWEST-varying over the device list, matching multi-slice
    enumeration (jax.devices() groups by slice), so 'model' collectives ride
    ICI and only the batch-gradient psum crosses DCN.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, cfg.model)
    dcn = max(1, getattr(cfg, "dcn", 1))
    if n % (model * dcn) != 0:
        raise ValueError(f"{n} devices not divisible by dcn×model={dcn}×{model}")
    data = cfg.data if cfg.data != -1 else n // (model * dcn)
    if dcn * data * model != n:
        raise ValueError(f"mesh {dcn}x{data}x{model} != {n} devices")
    if dcn > 1:
        arr = np.asarray(devices).reshape(dcn, data, model)
        return Mesh(arr, axis_names=("dcn",) + tuple(cfg.axis_names))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=cfg.axis_names)


def data_axis_size(mesh: Mesh) -> int:
    """Total batch-sharding ways: dcn × data on a two-level mesh."""
    return mesh.shape.get("data", 1) * mesh.shape.get("dcn", 1)


def shard_batch(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """NamedSharding placing the batch dimension on the 'data' mesh axis
    (on a two-level mesh: over ('dcn', 'data') combined)."""
    spec = [None] * ndim
    spec[batch_axis] = ("dcn", "data") if "dcn" in mesh.axis_names else "data"
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def with_sharding(tree, sharding: NamedSharding):
    """Device-put a pytree with one sharding."""
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)

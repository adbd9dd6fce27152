"""Device mesh construction and sharding helpers.

Replaces the reference's torch.distributed/NCCL + HF-Accelerate plumbing
(ttts/vqvae/train.py:44-60,119-135; ttts/gpt/train.py:43,58) with one JAX
mesh. Data parallelism is batch-axis sharding under jit; gradient mean is the
implicit psum XLA inserts. Tensor-parallel sharding of attention heads / FFN
is the 'model' axis. Axes are laid out so 'model' rides the innermost (ICI-
contiguous) devices and 'data' spans slices (DCN-friendly).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ttts_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over all (or given) devices.

    cfg.data == -1 means "all devices not claimed by other axes".
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, cfg.model)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    data = cfg.data if cfg.data != -1 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=cfg.axis_names)


def shard_batch(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """NamedSharding placing the batch dimension on the 'data' mesh axis."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def with_sharding(tree, sharding: NamedSharding):
    """Device-put a pytree with one sharding."""
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)

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

"""Parameter sharding rules for tensor parallelism over the 'model' axis.

The reference's only model parallelism is HF layer placement at inference
(ttts/gpt/model.py:48-66 parallelize). Here TP is proper GSPMD: large matmul
weights are sharded over the 'model' mesh axis on their output dimension and
XLA inserts the all-gathers/reduce-scatters; everything else is replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def infer_param_shardings(params, mesh: Mesh, min_size: int = 8192):
    """NamedSharding pytree: shard the last axis of large 2D+ weights over
    'model' when divisible; replicate the rest."""
    model_size = mesh.shape.get("model", 1)

    def rule(x):
        shape = np.shape(x)
        if (
            model_size > 1
            and len(shape) >= 2
            and int(np.prod(shape)) >= min_size
            and shape[-1] % model_size == 0
        ):
            spec = [None] * (len(shape) - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_params(params, mesh: Mesh, min_size: int = 8192):
    shardings = infer_param_shardings(params, mesh, min_size)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)

"""Mesh / sharding bootstrap tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ttts_tpu.config import MeshConfig
from ttts_tpu.parallel import make_mesh, replicate, shard_batch


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=-1, model=2))
    assert mesh.shape == {"data": 4, "model": 2}


def test_data_parallel_mean_grad():
    mesh = make_mesh(MeshConfig())
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    xs = jax.device_put(x, shard_batch(mesh, 2))
    w = jax.device_put(np.ones((4,), np.float32), replicate(mesh))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g = jax.jit(jax.grad(loss))(w, xs)
    gref = jax.grad(loss)(jnp.ones((4,)), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), rtol=1e-6)

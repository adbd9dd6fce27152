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


def test_dcn_two_level_mesh_shapes():
    """(dcn, data, model) two-level mesh (SURVEY §5.8): dcn slowest-varying,
    model on the ICI-innermost axis."""
    from ttts_tpu.parallel import data_axis_size

    mesh = make_mesh(MeshConfig(dcn=2, data=-1, model=2))
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.shape == {"dcn": 2, "data": 2, "model": 2}
    assert data_axis_size(mesh) == 4
    # dcn groups are contiguous halves of the device list (slice grouping)
    devs = np.asarray(mesh.devices)
    flat = list(jax.devices())
    assert [d.id for d in devs[0].ravel()] == [d.id for d in flat[:4]]
    assert [d.id for d in devs[1].ravel()] == [d.id for d in flat[4:]]


def test_dcn_mesh_batch_grad_matches_unsharded():
    """Batch sharded over ('dcn','data') + weight over 'model': gradient mean
    (one psum across dcn×data) must equal the unsharded result."""
    mesh = make_mesh(MeshConfig(dcn=2, data=-1, model=2))
    x = np.arange(64, dtype=np.float32).reshape(8, 8) * 0.1
    xs = jax.device_put(x, shard_batch(mesh, 2))
    spec = shard_batch(mesh, 2).spec
    assert spec == P(("dcn", "data"), None)
    w = np.ones((8, 4), np.float32)
    from jax.sharding import NamedSharding

    ws = jax.device_put(w, NamedSharding(mesh, P(None, "model")))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g = jax.jit(jax.grad(loss))(ws, xs)
    gref = jax.grad(loss)(jnp.asarray(w), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), rtol=1e-5)

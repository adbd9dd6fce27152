from ttts_tpu.parallel.mesh import make_mesh, shard_batch, replicate, with_sharding  # noqa: F401

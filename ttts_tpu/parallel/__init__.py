from ttts_tpu.parallel.mesh import data_axis_size, make_mesh, shard_batch, replicate, with_sharding  # noqa: F401

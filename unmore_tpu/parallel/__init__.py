from unmore_tpu.parallel.mesh import data_parallel_mesh, shard_batch, replicate

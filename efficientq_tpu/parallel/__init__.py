from .mesh import (batch_sharding, data_parallel_train_step,  # noqa: F401
                   make_mesh, replicate, shard_batch, shard_patch_inference)

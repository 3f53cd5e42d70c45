from .mesh import (batch_axes, batch_sharding,  # noqa: F401
                   data_parallel_train_step, fsdp_shardings,
                   host_local_batch, init_distributed, make_hybrid_mesh,
                   make_mesh, make_mesh_2d, make_sharded_volume_inferencer,
                   replicate, shard_batch, shard_patch_inference,
                   tensor_parallel_apply, tensor_parallel_shardings)
from .ptq import sharded_gram_stats  # noqa: F401

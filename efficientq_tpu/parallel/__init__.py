from .mesh import (batch_sharding, data_parallel_train_step,  # noqa: F401
                   fsdp_shardings, make_mesh, make_mesh_2d,
                   make_sharded_volume_inferencer, replicate, shard_batch,
                   shard_patch_inference, tensor_parallel_apply,
                   tensor_parallel_shardings)
from .ptq import sharded_gram_stats  # noqa: F401

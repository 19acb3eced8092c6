from clipbert_tpu.core.mesh import (DATA_AXIS, MODEL_AXIS, data_shard,
                                    make_mesh, replicate, replicate_tree,
                                    shard_batch)
from clipbert_tpu.parallel.sharding import (param_shardings,
                                            shard_train_state)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "data_shard", "make_mesh", "replicate",
           "replicate_tree", "shard_batch", "param_shardings",
           "shard_train_state"]

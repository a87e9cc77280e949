from .mesh import (batch_sharding, check_replica_consistency, create_mesh,
                   gather_to_host, param_sharding, replicated, seq_sharding,
                   shard_train_state)
from ..ops.flash_attention import set_sp_context, sp_context

from .mesh import (batch_sharding, create_mesh, param_sharding, replicated,
                   shard_train_state)

from .mesh import (batch_sharding, make_mesh, make_parallel_train_step,
                   replicated)

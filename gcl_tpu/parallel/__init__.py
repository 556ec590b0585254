from .mesh import (batch_sharding, host_to_global, make_global_grad_fn,
                   make_mesh, make_parallel_train_step, replicated)

from .mesh import batch_sharding, make_mesh, param_sharding, replicated
from .multihost import (
    gather_object,
    initialize_distributed,
    is_main_process,
    num_processes,
    reduce_dict,
)

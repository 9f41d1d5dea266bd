from .batch import BatchedSolver, BatchResult
from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    init_distributed,
)

from .mesh import make_mesh, batch_sharding, replicated, shard_batch
from .distributed import initialize, is_primary

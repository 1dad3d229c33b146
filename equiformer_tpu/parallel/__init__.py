from .mesh import make_mesh, make_parallel_train_step, shard_batch, stack_batches
from .dist import init_distributed, is_master, world_size

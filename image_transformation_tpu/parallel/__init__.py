from .mesh import make_mesh, shard_batched
from .sweep import batched_compose_step, sharded_compose_step, throughput_sweep

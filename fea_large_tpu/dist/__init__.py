from fea_large_tpu.dist.partition import Partition, partition_mesh  # noqa: F401
from fea_large_tpu.dist.sharded import ShardedNewtonSolver  # noqa: F401

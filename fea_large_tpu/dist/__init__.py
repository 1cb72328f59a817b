from fea_large_tpu.dist.partition import Partition, partition_mesh  # noqa: F401
from fea_large_tpu.dist.sharded import ShardedNewtonSolver  # noqa: F401
from fea_large_tpu.dist.structured import (  # noqa: F401
    StructuredPartition,
    structured_partition,
)
from fea_large_tpu.dist.structured_solver import (  # noqa: F401
    StructuredShardedSolver,
    make_sharded_solver,
)

from .mesh import make_mesh, data_parallel_sharding
from .sharded import (
    ShardedFSM,
    shard_compiled,
    sharded_pdfposteriors,
    sharded_logmarginal,
    sharded_viterbi,
)
from .timeshard import timesharded_forward

from .mesh import make_mesh, data_parallel_sharding
from .sharded import (
    ShardedFSM,
    ShardedProbFSM,
    halo_report,
    shard_compiled,
    shard_compiled_prob,
    sharded_logmarginal,
    sharded_logmarginal_prob,
    sharded_pdfposteriors,
    sharded_pdfposteriors_prob,
    sharded_viterbi,
)
from .timeshard import timesharded_forward

from sgl_tpu.parallel.mesh import init_distributed, make_mesh, data_sharding, replicated
from sgl_tpu.parallel.spmm_dist import (
    DistAdj,
    DistChunkedAdj,
    partition_adj,
    partition_adj_chunked,
    pad_features,
    make_dist_spmm,
    k_hop_propagate_dist,
    ring_padding_stats,
    ShardedHops,
)
from sgl_tpu.parallel.train_dist import make_parallel_train_step, replicate_state

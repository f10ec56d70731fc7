"""Multi-device / multi-host parallel training and encoding."""

from vq_tpu.parallel.data import (
    sharded_from_callback,
    sharded_synthetic_corpus,
)
from vq_tpu.parallel.encode import sharded_pq_encode, sharded_quantize
from vq_tpu.parallel.flat import (
    sharded_flat_search,
    sharded_flat_search_core,
)
from vq_tpu.parallel.graph import (
    sharded_graph_search,
    sharded_graph_search_core,
)
from vq_tpu.parallel.ivf import (
    shard_buckets,
    sharded_ivf_search,
    sharded_ivf_search_core,
)
from vq_tpu.parallel.opq import sharded_opq_train
from vq_tpu.parallel.stream import sharded_pq_minibatch_update
from vq_tpu.parallel.refine import (
    sharded_refine_search,
    sharded_refine_search_core,
)
from vq_tpu.parallel.ivf_scan import (
    sharded_ivf_scan_search,
    sharded_scan_search_core,
)
from vq_tpu.parallel.kmeans import (
    ShardedKMeansResult,
    sharded_lloyd,
    sharded_pq_train,
)
from vq_tpu.parallel.mesh import (
    DATA_AXIS,
    init_distributed,
    SUBSPACE_AXIS,
    make_mesh,
    replicate,
    shard_rows,
)

__all__ = [
    "DATA_AXIS",
    "SUBSPACE_AXIS",
    "make_mesh",
    "init_distributed",
    "replicate",
    "shard_rows",
    "ShardedKMeansResult",
    "sharded_lloyd",
    "sharded_pq_train",
    "sharded_opq_train",
    "sharded_pq_minibatch_update",
    "sharded_from_callback",
    "sharded_synthetic_corpus",
    "sharded_pq_encode",
    "sharded_quantize",
    "sharded_ivf_search",
    "sharded_ivf_search_core",
    "sharded_scan_search_core",
    "sharded_ivf_scan_search",
    "sharded_graph_search",
    "sharded_graph_search_core",
    "sharded_flat_search",
    "sharded_flat_search_core",
    "sharded_refine_search",
    "sharded_refine_search_core",
    "shard_buckets",
]

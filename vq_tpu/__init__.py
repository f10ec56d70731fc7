"""vq_tpu — a TPU-native vector-quantization framework (JAX/XLA/Pallas).

Covers the reference CogitatorTech/vq's full surface (reference crate root:
src/lib.rs:32-49) with batch-first TPU-native APIs:

* :class:`BinaryQuantizer` — threshold quantization + sign-bit packing
* :class:`ScalarQuantizer` — uniform int8 affine quantization
* :class:`ProductQuantizer` — k-means sub-codebooks, u8 codes, ADC search
* :class:`TSVQ` — variance-split hierarchical tree quantization
* :class:`Distance` / :class:`Metric` — 4 metrics, batched on the MXU
* :func:`lloyd` — blockwise Lloyd's k-means (the LBG trainer)
* ``vq_tpu.parallel`` — multi-host sharded training over a device mesh
* :func:`get_backend` — active compute-backend introspection (the analog of
  the reference's ``get_simd_backend``, src/core/hsdlib_ffi.rs:144-155)

Example (the crate-root doctest analog, reference src/lib.rs:19-30):

>>> import numpy as np
>>> import vq_tpu
>>> data = np.tile(
...     np.array([[0., 0., 1., 1.], [1., 1., 0., 0.]], np.float32), (8, 1)
... )
>>> pq = vq_tpu.ProductQuantizer(data, num_subspaces=2, num_centroids=2)
>>> codes = pq.encode(data)
>>> codes.shape, str(codes.dtype)
((16, 2), 'uint8')
>>> bool(np.allclose(pq.decode(codes), data))
True
"""

from vq_tpu.errors import (
    DimensionMismatch,
    EmptyInput,
    InvalidData,
    InvalidParameter,
    NativeLibraryError,
    VqError,
)
from vq_tpu.models.base import Quantizer
from vq_tpu.models.bq import (
    BinaryQuantizer,
    hamming_distance,
    pack_bits,
    packed_width,
    unpack_bits,
)
from vq_tpu.models.opq import OPQQuantizer, opq_train
from vq_tpu.models.rq import (
    ResidualQuantizer,
    rq_decode,
    rq_encode,
    rq_refine_joint,
    rq_train,
)
from vq_tpu.models.pq import ProductQuantizer, pq_decode, pq_encode, pq_train
from vq_tpu.models.sq import PerDimScalarQuantizer, ScalarQuantizer
from vq_tpu.models.tsvq import TSVQ, TSVQTree, tsvq_build
from vq_tpu.ops.distance import Distance, Metric, distance, nearest, pairwise, rowwise
from vq_tpu.ivf import IVFPQIndex
from vq_tpu.graph import GraphIndex
from vq_tpu.ivf_binary import IVFBinaryIndex
from vq_tpu.ivf_flat import IVFFlatIndex, IVFRQIndex, IVFSQIndex
from vq_tpu.clustering import Kmeans
from vq_tpu.ops.kmeans import (
    KMeansResult,
    kmeans_plusplus_init_device,
    lloyd,
    lloyd_batched,
)
from vq_tpu.models.pq_anisotropic import (
    AnisotropicProductQuantizer,
    mips_adc_search,
    pq_encode_anisotropic,
    pq_refine_anisotropic,
    pq_train_anisotropic,
)
from vq_tpu.ops.kmeans_anisotropic import (
    anisotropic_assign,
    anisotropic_eta,
    lloyd_anisotropic,
)
from vq_tpu.ops.kmeans_stepped import lloyd_stepped
from vq_tpu.ops.kmeans_stream import lloyd_minibatch
from vq_tpu.ops.knn import knn_graph
from vq_tpu.ops.packing import pack_codes, unpack_codes
from vq_tpu.search import BinaryIndex, FlatIndex, PQIndex, RQIndex, SQIndex
from vq_tpu.transforms import (
    CenteringTransform,
    NormalizeTransform,
    PCATransform,
    RotationTransform,
    TransformedIndex,
    VectorTransform,
    itq_train,
)
from vq_tpu.factory import IdMapIndex, index_factory, load_index
from vq_tpu.refine import RefineIndex
from vq_tpu.serving import BatchPipeline, pipelined_search
from vq_tpu.tune import (
    OperatingPoint,
    exact_neighbors,
    pareto,
    recall_at,
    sweep,
    tune,
)

__version__ = "0.1.0"


def get_backend() -> str:
    """Name of the active compute backend (e.g. ``"tpu"``, ``"cpu"``).

    The TPU-world analog of the reference's ``get_simd_backend()``
    (src/core/hsdlib_ffi.rs:144-155): reports which hardware the distance
    kernels will run on.
    """
    import jax

    backend = jax.default_backend()
    if backend == "tpu":
        kind = jax.devices()[0].device_kind
        return f"TPU ({kind})"
    return backend.upper()


# pyvq exposes the same function under this name (pyvq/src/lib.rs:41-49).
get_simd_backend = get_backend

__all__ = [
    "BinaryQuantizer",
    "ScalarQuantizer",
    "PerDimScalarQuantizer",
    "ProductQuantizer",
    "AnisotropicProductQuantizer",
    "pq_train_anisotropic",
    "pq_encode_anisotropic",
    "pq_refine_anisotropic",
    "mips_adc_search",
    "OPQQuantizer",
    "opq_train",
    "ResidualQuantizer",
    "rq_train",
    "rq_encode",
    "rq_decode",
    "rq_refine_joint",
    "TSVQ",
    "TSVQTree",
    "Quantizer",
    "Distance",
    "Metric",
    "KMeansResult",
    "VqError",
    "DimensionMismatch",
    "EmptyInput",
    "InvalidParameter",
    "InvalidData",
    "NativeLibraryError",
    "distance",
    "pairwise",
    "rowwise",
    "nearest",
    "Kmeans",
    "lloyd",
    "lloyd_batched",
    "lloyd_stepped",
    "lloyd_minibatch",
    "kmeans_plusplus_init_device",
    "lloyd_anisotropic",
    "anisotropic_assign",
    "anisotropic_eta",
    "FlatIndex",
    "PQIndex",
    "BinaryIndex",
    "VectorTransform",
    "PCATransform",
    "RotationTransform",
    "NormalizeTransform",
    "CenteringTransform",
    "TransformedIndex",
    "itq_train",
    "IdMapIndex",
    "index_factory",
    "load_index",
    "BatchPipeline",
    "pipelined_search",
    "OperatingPoint",
    "exact_neighbors",
    "recall_at",
    "sweep",
    "pareto",
    "tune",
    "SQIndex",
    "RQIndex",
    "pack_codes",
    "unpack_codes",
    "knn_graph",
    "IVFPQIndex",
    "RefineIndex",
    "GraphIndex",
    "IVFBinaryIndex",
    "IVFFlatIndex",
    "IVFSQIndex",
    "IVFRQIndex",
    "pq_train",
    "pq_encode",
    "pq_decode",
    "tsvq_build",
    "pack_bits",
    "unpack_bits",
    "packed_width",
    "hamming_distance",
    "get_backend",
    "get_simd_backend",
]

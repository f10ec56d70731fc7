"""Utilities: serialization (checkpoint/save-load), metrics logging, and
standard ANN-benchmark dataset readers."""

from vq_tpu.utils.datasets import (
    load_dataset,
    read_bvecs,
    read_fvecs,
    read_ivecs,
)
from vq_tpu.utils.metrics import MetricsLogger, trace
from vq_tpu.utils.serialize import (
    KMeansCheckpoint,
    load,
    load_kmeans_state,
    save,
    save_kmeans_state,
)

__all__ = [
    "save",
    "load",
    "KMeansCheckpoint",
    "save_kmeans_state",
    "load_kmeans_state",
    "MetricsLogger",
    "trace",
    "read_fvecs",
    "read_bvecs",
    "read_ivecs",
    "load_dataset",
]

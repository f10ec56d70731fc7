"""Utilities: serialization (checkpoint/save-load) and metrics logging."""

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
]

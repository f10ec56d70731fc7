"""Checkpoint / save-load for every quantizer — a first-class feature.

The reference has no serialization at all; it is an unimplemented roadmap
item ("Persistent serialization", reference ROADMAP.md §3). vq_tpu makes it
first-class (SURVEY.md §5 "Checkpoint / resume"): every quantizer's trained
state is a small pytree of arrays + a static config dict, written as a
single ``.npz`` file (portable, no framework lock-in; arrays round-trip
bit-exactly).

The same mechanism checkpoints in-progress k-means training: per-Lloyd-
iteration state is just ``(centroids, iteration, key)`` — tiny — so resumable
multi-host training costs one small write per iteration.

API:
    save(path, quantizer)          -> writes <path> (.npz appended if absent)
    load(path)                     -> reconstructed quantizer of the saved type
    save_kmeans_state(path, state) / load_kmeans_state(path)
"""

from __future__ import annotations

import json
from typing import Any, Dict, NamedTuple

import jax.numpy as jnp
import numpy as np

from vq_tpu.errors import InvalidData, InvalidParameter

_FORMAT_VERSION = 1


def _to_npz(path: str, kind: str, config: Dict[str, Any], arrays: Dict[str, np.ndarray]) -> str:
    if not path.endswith(".npz"):
        path = path + ".npz"
    header = json.dumps(
        {"format_version": _FORMAT_VERSION, "kind": kind, "config": config}
    )
    np.savez(
        path,
        __vq_header__=np.frombuffer(header.encode(), dtype=np.uint8),
        **{k: np.asarray(v) for k, v in arrays.items()},
    )
    return path


def _from_npz(path: str):
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        if "__vq_header__" not in z:
            raise InvalidData(f"{path} is not a vq_tpu checkpoint")
        header = json.loads(bytes(z["__vq_header__"]).decode())
        if header.get("format_version") != _FORMAT_VERSION:
            raise InvalidData(
                f"unsupported checkpoint version {header.get('format_version')}"
            )
        arrays = {k: z[k] for k in z.files if k != "__vq_header__"}
    return header["kind"], header["config"], arrays


def save(path: str, quantizer) -> str:
    """Serialize any vq_tpu quantizer to ``path`` (.npz). Returns the path."""
    from vq_tpu.models.bq import BinaryQuantizer
    from vq_tpu.models.pq import ProductQuantizer
    from vq_tpu.models.sq import ScalarQuantizer
    from vq_tpu.models.tsvq import TSVQ

    if isinstance(quantizer, BinaryQuantizer):
        return _to_npz(
            path,
            "bq",
            {
                "threshold": quantizer.threshold,
                "low": quantizer.low,
                "high": quantizer.high,
            },
            {},
        )
    from vq_tpu.models.sq import PerDimScalarQuantizer

    if isinstance(quantizer, PerDimScalarQuantizer):
        return _to_npz(
            path,
            "sq_perdim",
            {"levels": quantizer.levels},
            {
                "mins": np.asarray(quantizer.mins),
                "maxs": np.asarray(quantizer.maxs),
            },
        )
    if isinstance(quantizer, ScalarQuantizer):
        return _to_npz(
            path,
            "sq",
            {
                "min": quantizer.min,
                "max": quantizer.max,
                "levels": quantizer.levels,
            },
            {},
        )
    from vq_tpu.models.opq import OPQQuantizer
    from vq_tpu.models.rq import ResidualQuantizer

    if isinstance(quantizer, ResidualQuantizer):
        return _to_npz(
            path, "rq", {}, {"codebooks": np.asarray(quantizer.codebooks)}
        )
    if isinstance(quantizer, OPQQuantizer):
        return _to_npz(
            path,
            "opq",
            {},
            {
                "rotation": np.asarray(quantizer.rotation),
                "codebooks": np.asarray(quantizer.codebooks),
            },
        )
    from vq_tpu.models.pq_anisotropic import AnisotropicProductQuantizer

    if isinstance(quantizer, AnisotropicProductQuantizer):
        # Checked before the plain-PQ branch: it subclasses ProductQuantizer
        # and would otherwise round-trip without its eta.
        return _to_npz(
            path,
            "pq_aniso",
            {"eta": quantizer.eta},
            {"codebooks": np.asarray(quantizer.codebooks)},
        )
    if isinstance(quantizer, ProductQuantizer):
        return _to_npz(
            path,
            "pq",
            {"distance": quantizer.distance_metric},
            {"codebooks": np.asarray(quantizer.codebooks)},
        )
    if isinstance(quantizer, TSVQ):
        t = quantizer.tree
        return _to_npz(
            path,
            "tsvq",
            {"distance": quantizer.distance_metric, "depth": t.depth},
            {
                "centroids": np.asarray(t.centroids),
                "left": np.asarray(t.left),
                "right": np.asarray(t.right),
            },
        )
    raise InvalidParameter(
        "quantizer", f"don't know how to serialize {type(quantizer).__name__}"
    )


def load(path: str):
    """Load a quantizer saved with :func:`save`; returns the right class."""
    from vq_tpu.models.bq import BinaryQuantizer
    from vq_tpu.models.pq import ProductQuantizer
    from vq_tpu.models.sq import ScalarQuantizer
    from vq_tpu.models.tsvq import TSVQ, TSVQTree

    kind, config, arrays = _from_npz(path)
    if kind == "bq":
        return BinaryQuantizer(
            threshold=config["threshold"], low=config["low"], high=config["high"]
        )
    if kind == "sq_perdim":
        from vq_tpu.models.sq import PerDimScalarQuantizer

        return PerDimScalarQuantizer(
            arrays["mins"], arrays["maxs"], levels=config["levels"]
        )
    if kind == "sq":
        return ScalarQuantizer(
            min=config["min"], max=config["max"], levels=config["levels"]
        )
    if kind == "pq":
        return ProductQuantizer(
            distance=config["distance"], codebooks=arrays["codebooks"]
        )
    if kind == "pq_aniso":
        from vq_tpu.models.pq_anisotropic import AnisotropicProductQuantizer

        return AnisotropicProductQuantizer(
            codebooks=arrays["codebooks"], eta=config["eta"]
        )
    if kind == "opq":
        from vq_tpu.models.opq import OPQQuantizer

        return OPQQuantizer(
            rotation=arrays["rotation"], codebooks=arrays["codebooks"]
        )
    if kind == "rq":
        from vq_tpu.models.rq import ResidualQuantizer

        return ResidualQuantizer(codebooks=arrays["codebooks"])
    if kind == "tsvq":
        tree = TSVQTree(
            arrays["centroids"], arrays["left"], arrays["right"], config["depth"]
        )
        return TSVQ(distance=config["distance"], tree=tree)
    raise InvalidData(f"unknown checkpoint kind {kind!r}")


class KMeansCheckpoint(NamedTuple):
    """Mid-training Lloyd state — everything needed to resume."""

    centroids: jnp.ndarray  # [k, d] or [m, k, d]
    iteration: int
    seed: int


def save_kmeans_state(path: str, state: KMeansCheckpoint) -> str:
    """Checkpoint an in-progress Lloyd run (resumable training)."""
    return _to_npz(
        path,
        "kmeans_state",
        {"iteration": int(state.iteration), "seed": int(state.seed)},
        {"centroids": np.asarray(state.centroids)},
    )


def load_kmeans_state(path: str) -> KMeansCheckpoint:
    kind, config, arrays = _from_npz(path)
    if kind != "kmeans_state":
        raise InvalidData(f"expected a kmeans_state checkpoint, got {kind!r}")
    return KMeansCheckpoint(
        centroids=jnp.asarray(arrays["centroids"]),
        iteration=config["iteration"],
        seed=config["seed"],
    )

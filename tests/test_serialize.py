"""Checkpoint round-trip tests for every quantizer type.

The reference has no serialization (unimplemented roadmap item, reference
ROADMAP.md §3); these tests define the new framework's save/load contract:
bit-exact array round-trips and behaviorally identical reloaded quantizers.
"""

import numpy as np
import pytest

from vq_tpu import (
    TSVQ,
    BinaryQuantizer,
    ProductQuantizer,
    ScalarQuantizer,
)
from vq_tpu.utils import (
    KMeansCheckpoint,
    load,
    load_kmeans_state,
    save,
    save_kmeans_state,
)


@pytest.fixture
def data(rng):
    return rng.random((256, 32), dtype=np.float32)


def test_bq_roundtrip(tmp_path):
    q = BinaryQuantizer(0.25, low=3, high=200)
    path = save(str(tmp_path / "bq"), q)
    q2 = load(path)
    assert isinstance(q2, BinaryQuantizer)
    assert (q2.threshold, q2.low, q2.high) == (0.25, 3, 200)
    x = np.linspace(-1, 1, 64, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(q.quantize(x)), np.asarray(q2.quantize(x)))


def test_sq_roundtrip(tmp_path):
    q = ScalarQuantizer(-2.0, 3.0, levels=31)
    q2 = load(save(str(tmp_path / "sq"), q))
    assert isinstance(q2, ScalarQuantizer)
    assert (q2.min, q2.max, q2.levels) == (-2.0, 3.0, 31)
    assert q2.step == q.step
    x = np.linspace(-3, 4, 128, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(q.quantize(x)), np.asarray(q2.quantize(x)))


def test_pq_roundtrip(tmp_path, data):
    q = ProductQuantizer(data, num_subspaces=4, num_centroids=8, max_iters=3,
                         distance="cosine")
    q2 = load(save(str(tmp_path / "pq"), q))
    assert isinstance(q2, ProductQuantizer)
    assert q2.distance_metric == "cosine"
    np.testing.assert_array_equal(
        np.asarray(q.codebooks), np.asarray(q2.codebooks)
    )
    np.testing.assert_array_equal(
        np.asarray(q.encode(data)), np.asarray(q2.encode(data))
    )


def test_tsvq_roundtrip(tmp_path, data):
    q = TSVQ(data, max_depth=4, distance="manhattan")
    q2 = load(save(str(tmp_path / "tsvq"), q))
    assert isinstance(q2, TSVQ)
    assert q2.distance_metric == "manhattan"
    assert q2.num_nodes == q.num_nodes
    np.testing.assert_array_equal(
        np.asarray(q.encode(data)), np.asarray(q2.encode(data))
    )


def test_kmeans_state_roundtrip(tmp_path, rng):
    centroids = rng.random((16, 8), dtype=np.float32)
    st = KMeansCheckpoint(centroids=centroids, iteration=7, seed=42)
    st2 = load_kmeans_state(save_kmeans_state(str(tmp_path / "km"), st))
    assert st2.iteration == 7 and st2.seed == 42
    np.testing.assert_array_equal(np.asarray(st2.centroids), centroids)


def test_load_rejects_wrong_kind(tmp_path, rng):
    from vq_tpu.errors import InvalidData

    centroids = rng.random((4, 4), dtype=np.float32)
    p = save_kmeans_state(
        str(tmp_path / "km"), KMeansCheckpoint(centroids, 0, 0)
    )
    with pytest.raises(InvalidData):
        load(p)


def test_load_rejects_non_checkpoint(tmp_path):
    from vq_tpu.errors import InvalidData

    p = str(tmp_path / "junk.npz")
    np.savez(p, a=np.zeros(3))
    with pytest.raises(InvalidData):
        load(p)

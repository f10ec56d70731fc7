"""IVF-PQ index: train/add/search/rerank/save/load."""

import numpy as np
import pytest

from vq_tpu.errors import DimensionMismatch, EmptyInput, InvalidData
from vq_tpu.ivf import IVFPQIndex


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(9)
    centers = rng.normal(0, 2.0, (32, 32)).astype(np.float32)
    which = rng.integers(0, 32, 5000)
    data = (centers[which] + rng.normal(0, 0.15, (5000, 32))).astype(
        np.float32
    )
    return data


@pytest.fixture(scope="module")
def index(clustered):
    idx = IVFPQIndex.train(
        clustered[:2000], nlist=32, num_subspaces=4, num_centroids=32,
        max_iters=8, keep_corpus=True,
    )
    idx.add(clustered)
    return idx


def exact_knn(queries, corpus, k):
    d = np.sum((corpus[None] - queries[:, None]) ** 2, axis=-1)
    return np.argsort(d, axis=1)[:, :k]


def test_shapes_and_counts(index, clustered):
    assert index.ntotal == 5000
    assert index.nlist == 32
    ids, dist = index.search(clustered[:7], k=5, nprobe=4)
    assert np.asarray(ids).shape == (7, 5)
    d = np.asarray(dist)
    assert (np.diff(d, axis=1) >= -1e-5).all()


def test_recall_vs_exact(index, clustered):
    queries = clustered[:50]
    truth = exact_knn(queries, clustered, 10)
    ids, _ = index.search(queries, k=10, nprobe=8)
    ids = np.asarray(ids)
    recall = np.mean(
        [len(set(r.tolist()) & set(t.tolist())) / 10 for r, t in zip(ids, truth)]
    )
    # 4x32 codes (20 bits) bound in-cluster resolution; exact rerank over a
    # 100-wide shortlist recovers nearly everything.
    assert recall > 0.15
    ids_rr, _ = index.search(queries, k=10, nprobe=8, rerank=100)
    recall_rr = np.mean(
        [len(set(r.tolist()) & set(t.tolist())) / 10
         for r, t in zip(np.asarray(ids_rr), truth)]
    )
    assert recall_rr > 0.8  # bounded by nprobe=8/32 list coverage

    # more probes must not hurt recall
    ids_all, _ = index.search(queries, k=10, nprobe=32)
    recall_all = np.mean(
        [len(set(r.tolist()) & set(t.tolist())) / 10
         for r, t in zip(np.asarray(ids_all), truth)]
    )
    assert recall_all >= recall - 1e-9


def test_rerank_nails_self(index, clustered):
    ids, dist = index.search(clustered[10:15], k=1, nprobe=8, rerank=50)
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], np.arange(10, 15))
    assert np.asarray(dist).max() < 1e-4


def test_save_load(index, clustered, tmp_path):
    p = index.save(str(tmp_path / "ivf"))
    idx2 = IVFPQIndex.load(p)
    assert idx2.ntotal == index.ntotal
    a, _ = index.search(clustered[:5], k=3, nprobe=4)
    b, _ = idx2.search(clustered[:5], k=3, nprobe=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_incremental_add(clustered):
    idx = IVFPQIndex.train(
        clustered[:1000], nlist=16, num_subspaces=4, num_centroids=16
    )
    idx.add(clustered[:500])
    ids1, _ = idx.search(clustered[:3], k=2, nprobe=16)
    idx.add(clustered[500:1000])
    assert idx.ntotal == 1000
    ids2, _ = idx.search(clustered[:3], k=2, nprobe=16)
    assert np.asarray(ids2).shape == (3, 2)


def test_validation(clustered):
    idx = IVFPQIndex.train(
        clustered[:500], nlist=8, num_subspaces=4, num_centroids=8
    )
    with pytest.raises(EmptyInput):
        idx.search(clustered[:2])
    with pytest.raises(DimensionMismatch):
        idx.add(np.zeros((3, 16), np.float32))
    idx.add(clustered[:100])
    with pytest.raises(InvalidData):
        idx.search(clustered[:2], rerank=10)  # no corpus kept


def test_max_list_size_caps_memory(clustered):
    idx = IVFPQIndex.train(
        clustered[:1000], nlist=8, num_subspaces=4, num_centroids=8,
    )
    idx.max_list_size = 64
    idx.add(clustered)  # 5000 rows over 8 lists -> heavy overflow
    stats = idx.bucket_stats()
    assert stats["cap"] <= 64
    assert stats["overflow_dropped"] > 0
    # search still works over the capped structure
    ids, dist = idx.search(clustered[:3], k=5, nprobe=8)
    assert np.asarray(ids).shape == (3, 5)
    assert np.isfinite(np.asarray(dist)).all()


def test_bucket_stats_shape(index):
    stats = index.bucket_stats()
    assert stats["ntotal"] == 5000
    assert stats["overflow_dropped"] == 0
    assert 0.0 <= stats["padding_waste"] < 1.0


def test_search_k_beyond_probe_pool(index, clustered):
    # Round-2 regression (ADVICE medium): k or rerank larger than
    # nprobe * cap used to raise ValueError from top_k instead of honoring
    # the documented "-1 = fewer than k candidates" padding contract.
    cap = int(index._build_buckets()[1].shape[1])
    big_k = 2 * cap + 3  # > nprobe * cap with nprobe=2? ensure strictly over
    ids, dist = index.search(clustered[:3], k=big_k, nprobe=1)
    ids, dist = np.asarray(ids), np.asarray(dist)
    assert ids.shape == (3, big_k)
    # tail must be padded, not garbage
    assert (ids[:, cap:] == -1).all()
    assert np.isinf(dist[:, cap:]).all()
    # padded entries never shadow real ones
    assert (dist[:, : cap - 1] <= dist[:, 1:cap]).all()


def test_search_rerank_beyond_probe_pool(index, clustered):
    cap = int(index._build_buckets()[1].shape[1])
    ids, dist = index.search(clustered[:3], k=5, nprobe=1, rerank=3 * cap)
    assert np.asarray(ids).shape == (3, 5)
    # top hit is still the query itself (it's in the corpus)
    assert np.asarray(dist)[:, 0].max() < 1e-3


def test_max_list_size_survives_save_load(clustered, tmp_path):
    # Round-2 regression (ADVICE low): max_list_size was dropped by save(),
    # so a loaded index silently lost its memory bound.
    idx = IVFPQIndex.train(
        clustered[:1000], nlist=8, num_subspaces=4, num_centroids=16,
        max_iters=4,
    )
    idx.max_list_size = 64
    idx.add(clustered)
    p = idx.save(str(tmp_path / "capped.npz"))
    loaded = IVFPQIndex.load(p)
    assert loaded.max_list_size == 64
    assert int(loaded._build_buckets()[1].shape[1]) <= 64

"""IVF-PQ index: train/add/search/rerank/save/load."""

import numpy as np
import pytest

from vq_tpu.errors import (
    DimensionMismatch,
    EmptyInput,
    InvalidData,
    InvalidParameter,
)
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
    cap = index._pool.cap
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
    cap = index._pool.cap
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
    assert loaded._pool.cap <= 64


def test_fused_probe_search_matches_xla(index, clustered):
    # Round-2 (VERDICT r1 #2): the fused Pallas probe kernel must return
    # identical ids/distances to the XLA gather path.
    from vq_tpu.ivf import _ivf_search_jit
    import jax.numpy as jnp

    bucket_codes, bucket_ids, chains = index._build_buckets()
    q = jnp.asarray(clustered[:9])
    args = (q, index.coarse, index.pq.codebooks, bucket_codes, bucket_ids,
            chains, 4, 7, index._pool.cap)
    ids_x, dist_x = _ivf_search_jit(*args, use_pallas=False)
    ids_p, dist_p = _ivf_search_jit(*args, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_x))
    np.testing.assert_allclose(
        np.asarray(dist_p), np.asarray(dist_x), rtol=1e-4, atol=1e-4
    )


class TestRebalance:
    @pytest.fixture()
    def skewed_index(self):
        # One dominant blob -> one hugely overfull list.
        rng = np.random.default_rng(31)
        centers = rng.normal(0, 4.0, (8, 16)).astype(np.float32)
        which = np.concatenate(
            [np.zeros(3000, int), rng.integers(1, 8, 600)]
        )
        data = (centers[which] + rng.normal(0, 0.2, (3600, 16))).astype(
            np.float32
        )
        idx = IVFPQIndex.train(
            data, nlist=8, num_subspaces=4, num_centroids=16,
            max_iters=6, keep_corpus=True,
        )
        idx.max_list_size = 512
        idx.add(data)
        return idx, data

    def test_overflow_dropped_zero_after_rebalance(self, skewed_index):
        # VERDICT r1 #8 done-criterion: after rebalance the cap drops
        # nothing, and recall against exact kNN does not regress.
        idx, data = skewed_index
        assert idx.bucket_stats()["overflow_dropped"] > 0  # skew is real
        queries = data[:50]
        exact = exact_knn(queries, data, 5)

        def recall(ids):
            ids = np.asarray(ids)
            return np.mean([
                len(set(ids[i]) & set(exact[i])) / 5
                for i in range(len(queries))
            ])

        r_before = recall(idx.search(queries, k=5, nprobe=4)[0])
        info = idx.rebalance(target_max=512)
        assert info["split"] >= 1
        stats = idx.bucket_stats()
        assert stats["overflow_dropped"] == 0
        assert stats["max"] <= 512
        r_after = recall(idx.search(queries, k=5, nprobe=6)[0])
        assert r_after >= r_before - 0.02

    def test_rebalance_without_corpus_reconstructs(self):
        rng = np.random.default_rng(33)
        centers = rng.normal(0, 4.0, (4, 8)).astype(np.float32)
        which = np.concatenate([np.zeros(1200, int), rng.integers(1, 4, 300)])
        data = (centers[which] + rng.normal(0, 0.1, (1500, 8))).astype(
            np.float32
        )
        idx = IVFPQIndex.train(
            data, nlist=4, num_subspaces=4, num_centroids=16, max_iters=5,
        )
        idx.add(data)
        info = idx.rebalance(target_max=400)
        assert info["split"] >= 1
        assert idx.bucket_stats()["max"] <= 400
        # Index still answers searches with itself in the top results.
        ids, _ = idx.search(data[:10], k=3, nprobe=4)
        hit = np.mean([(i in np.asarray(ids)[i]) for i in range(10)])
        assert hit >= 0.8

    def test_retire_small_lists(self):
        rng = np.random.default_rng(34)
        data = rng.random((500, 8), dtype=np.float32)
        idx = IVFPQIndex.train(
            data, nlist=16, num_subspaces=4, num_centroids=8, max_iters=5,
            keep_corpus=True,
        )
        idx.add(data)
        before = idx.nlist
        idx.rebalance(min_size=10)
        assert idx.nlist <= before
        counts = np.bincount(idx._flat_lists, minlength=idx.nlist)
        assert (counts[counts > 0] >= 1).all()
        assert idx.ntotal == 500  # nothing lost
        ids, _ = idx.search(data[:10], k=1, nprobe=idx.nlist)
        assert (np.asarray(ids)[:, 0] == np.arange(10)).mean() >= 0.9

    def test_noop_when_balanced(self, skewed_index):
        idx, _ = skewed_index
        info = idx.rebalance(target_max=10**9)
        assert info == {"split": 0, "retired": 0, "new_nlist": idx.nlist}


class TestIVFPQRangeSearch:
    """range_search on IVF-PQ: hits are ADC values within radius among
    the probed lists; counts are true probed-hit counts."""

    @pytest.fixture(scope="class")
    def built(self):
        rng = np.random.default_rng(57)
        centers = rng.normal(0, 3.0, (12, 32)).astype(np.float32)
        which = rng.integers(0, 12, 3000)
        x = (centers[which] + rng.normal(0, 0.3, (3000, 32))).astype(
            np.float32
        )
        idx = IVFPQIndex.train(
            x, nlist=12, num_subspaces=4, num_centroids=16, max_iters=4,
        )
        idx.add(x)
        return x, idx

    def _adc_values(self, idx, q):
        """Dense ADC values of every stored row (decoded via residual
        reconstruction) — the oracle for what range_search thresholds."""
        codes = np.asarray(
            idx._pool.gather_rows("codes", np.arange(idx.ntotal))
        )
        lists = np.asarray(idx._flat_lists)
        cb = np.asarray(idx.pq.codebooks)  # [m, k, s]
        m, k, s = cb.shape
        rec = cb[np.arange(m)[None, :], codes, :].reshape(len(codes), -1)
        if idx.by_residual:
            rec = rec + np.asarray(idx.coarse)[lists]
        return ((rec[None] - q[:, None]) ** 2).sum(-1)

    def test_full_probe_counts_match_dense_adc(self, built):
        x, idx = built
        q = np.asarray(x[:5]) + 0.01
        ref = self._adc_values(idx, q)
        radius = float(np.quantile(ref, 0.02))
        ids, vals, counts = idx.range_search(
            q, radius, nprobe=idx.nlist, max_results=512
        )
        got = np.asarray(counts)
        expect = (ref <= radius).sum(1)
        # fp boundary ties allowed (ADC sums reassociate)
        assert (np.abs(got - expect) <= np.maximum(1, 0.02 * expect)).all()
        ids_np = np.asarray(ids)
        core = set(np.nonzero(ref[0] <= radius - 1e-3)[0].tolist())
        assert core <= set(ids_np[0][ids_np[0] >= 0].tolist())

    def test_partial_probe_subset(self, built):
        x, idx = built
        q = np.asarray(x[:6])
        _, _, c_full = idx.range_search(q, 5.0, nprobe=idx.nlist)
        _, _, c_part = idx.range_search(q, 5.0, nprobe=3)
        assert (np.asarray(c_part) <= np.asarray(c_full)).all()

    def test_bad_args(self, built):
        _, idx = built
        with pytest.raises(InvalidParameter):
            idx.range_search(np.zeros((1, 32), np.float32), 1.0,
                             max_results=0)

"""IVF-Flat and IVF-SQ indexes: probe correctness, coding, persistence.

Ground truth throughout: full-probe (nprobe=nlist) search must equal the
exact brute-force scan over what the index stores (raw rows for Flat,
decoded rows for SQ) — the partition then only affects WHICH candidates
are seen, never their scores.
"""

import numpy as np
import pytest

from vq_tpu import IVFFlatIndex, IVFSQIndex
from vq_tpu.errors import (
    DimensionMismatch,
    EmptyInput,
    InvalidData,
    InvalidParameter,
)


@pytest.fixture(scope="module")
def corpus(rng):
    return rng.normal(0, 1, (4000, 32)).astype(np.float32)


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus[:12] + np.float32(0.01)


def brute_l2(q, y, k):
    d = np.sum((y[None] - q[:, None]) ** 2, axis=-1)
    ids = np.argsort(d, kind="stable", axis=1)[:, :k]
    return ids, np.take_along_axis(d, ids, axis=1)


def brute_dot(q, y, k):
    s = q @ y.T
    ids = np.argsort(-s, kind="stable", axis=1)[:, :k]
    return ids, np.take_along_axis(s, ids, axis=1)


class TestIVFFlat:
    def test_full_probe_is_exact(self, corpus, queries):
        idx = IVFFlatIndex.train(corpus, nlist=16, seed=3)
        idx.add(corpus)
        ids, d = idx.search(queries, k=7, nprobe=16)
        gt_ids, gt_d = brute_l2(queries, corpus, 7)
        np.testing.assert_array_equal(np.asarray(ids), gt_ids)
        np.testing.assert_allclose(np.asarray(d), gt_d, atol=1e-3)

    def test_partial_probe_recall(self, corpus, queries):
        idx = IVFFlatIndex.train(corpus, nlist=16, seed=3)
        idx.add(corpus)
        ids, _ = idx.search(queries, k=1, nprobe=4)
        gt_ids, _ = brute_l2(queries, corpus, 1)
        recall = (np.asarray(ids)[:, 0] == gt_ids[:, 0]).mean()
        assert recall >= 0.9  # near-duplicate queries probe the right list

    def test_dot_metric(self, corpus, queries):
        idx = IVFFlatIndex.train(corpus, nlist=16, seed=3, metric="dot")
        idx.add(corpus)
        ids, s = idx.search(queries, k=5, nprobe=16)
        gt_ids, gt_s = brute_dot(queries, corpus, 5)
        np.testing.assert_array_equal(np.asarray(ids), gt_ids)
        np.testing.assert_allclose(np.asarray(s), gt_s, atol=1e-3)
        assert (np.diff(np.asarray(s), axis=1) <= 1e-6).all()

    def test_bf16_storage(self, corpus, queries):
        idx = IVFFlatIndex.train(
            corpus, nlist=16, seed=3, store_dtype="bfloat16"
        )
        idx.add(corpus)
        assert str(idx._pool.data["rows"].dtype) == "bfloat16"
        ids, _ = idx.search(queries, k=1, nprobe=16)
        gt_ids, _ = brute_l2(queries, corpus, 1)
        # bf16 rounding may flip exact ties but near-duplicate top-1 holds
        assert (np.asarray(ids)[:, 0] == gt_ids[:, 0]).mean() >= 0.9

    def test_incremental_add_and_stats(self, corpus):
        idx = IVFFlatIndex.train(corpus, nlist=8, seed=1)
        idx.add(corpus[:1000])
        idx.add(corpus[1000:])
        assert idx.ntotal == 4000
        st = idx.bucket_stats()
        assert st["ntotal"] == 4000 and st["overflow_dropped"] == 0

    def test_max_list_size_drops_overflow(self, corpus):
        idx = IVFFlatIndex.train(
            corpus, nlist=8, seed=1, max_list_size=100
        )
        idx.add(corpus)
        st = idx.bucket_stats()
        assert st["cap"] <= 104
        assert st["overflow_dropped"] > 0

    def test_pads_when_pool_short(self, corpus):
        idx = IVFFlatIndex.train(corpus[:64], nlist=8, seed=1)
        idx.add(corpus[:20])
        ids, d = idx.search(corpus[:3], k=19, nprobe=1)
        ids = np.asarray(ids)
        assert ids.shape == (3, 19)
        assert (ids[:, -1] == -1).all()  # one probed list < 19 entries

    def test_save_load(self, corpus, queries, tmp_path):
        idx = IVFFlatIndex.train(
            corpus, nlist=8, seed=1, store_dtype="bfloat16"
        )
        idx.add(corpus)
        p = idx.save(str(tmp_path / "ivfflat"))
        idx2 = IVFFlatIndex.load(p)
        assert idx2.ntotal == idx.ntotal
        a_i, a_d = idx.search(queries, k=5, nprobe=4)
        b_i, b_d = idx2.search(queries, k=5, nprobe=4)
        np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
        np.testing.assert_allclose(np.asarray(a_d), np.asarray(b_d))

    def test_reconstruct(self, corpus):
        idx = IVFFlatIndex.train(corpus, nlist=8, seed=1)
        idx.add(corpus)
        np.testing.assert_allclose(
            np.asarray(idx.reconstruct([5, 17])), corpus[[5, 17]]
        )

    def test_errors(self, corpus):
        idx = IVFFlatIndex.train(corpus, nlist=8, seed=1)
        with pytest.raises(EmptyInput):
            idx.search(corpus[:2])
        with pytest.raises(DimensionMismatch):
            idx.add(np.zeros((2, 16), np.float32))
        with pytest.raises(InvalidParameter):
            IVFFlatIndex.train(corpus, nlist=8, store_dtype="int8")
        with pytest.raises(InvalidParameter):
            IVFFlatIndex.train(corpus, nlist=8, metric="cosine")


class TestIVFSQ:
    def test_full_probe_matches_decoded_bruteforce(self, corpus, queries):
        idx = IVFSQIndex.train(corpus, nlist=16, seed=3)
        idx.add(corpus)
        y = np.asarray(idx.reconstruct(np.arange(idx.ntotal)))
        ids, d = idx.search(queries, k=7, nprobe=16)
        gt_ids, gt_d = brute_l2(queries, y, 7)
        np.testing.assert_array_equal(np.asarray(ids), gt_ids)
        np.testing.assert_allclose(np.asarray(d), gt_d, atol=1e-3)

    def test_non_residual_matches_decoded_bruteforce(self, corpus, queries):
        idx = IVFSQIndex.train(corpus, nlist=16, seed=3, by_residual=False)
        idx.add(corpus)
        y = np.asarray(idx.reconstruct(np.arange(idx.ntotal)))
        ids, d = idx.search(queries, k=7, nprobe=16)
        gt_ids, gt_d = brute_l2(queries, y, 7)
        np.testing.assert_array_equal(np.asarray(ids), gt_ids)
        np.testing.assert_allclose(np.asarray(d), gt_d, atol=1e-3)

    @pytest.mark.parametrize("by_residual", [True, False])
    def test_dot_matches_decoded_bruteforce(
        self, corpus, queries, by_residual
    ):
        idx = IVFSQIndex.train(
            corpus, nlist=16, seed=3, metric="dot", by_residual=by_residual
        )
        idx.add(corpus)
        y = np.asarray(idx.reconstruct(np.arange(idx.ntotal)))
        ids, s = idx.search(queries, k=5, nprobe=16)
        gt_ids, gt_s = brute_dot(queries, y, 5)
        np.testing.assert_array_equal(np.asarray(ids), gt_ids)
        np.testing.assert_allclose(np.asarray(s), gt_s, atol=1e-3)

    def test_residual_coding_beats_raw(self, corpus):
        # Residual ranges are tighter than raw ranges -> lower recon MSE.
        res = IVFSQIndex.train(corpus, nlist=32, seed=3, levels=16)
        res.add(corpus)
        raw = IVFSQIndex.train(
            corpus, nlist=32, seed=3, levels=16, by_residual=False
        )
        raw.add(corpus)
        ids = np.arange(4000)
        mse_res = np.mean(
            (np.asarray(res.reconstruct(ids)) - corpus) ** 2
        )
        mse_raw = np.mean(
            (np.asarray(raw.reconstruct(ids)) - corpus) ** 2
        )
        assert mse_res < mse_raw

    def test_sq8_top1_recall(self, corpus, queries):
        idx = IVFSQIndex.train(corpus, nlist=16, seed=3)
        idx.add(corpus)
        ids, _ = idx.search(queries, k=1, nprobe=4)
        gt_ids, _ = brute_l2(queries, corpus, 1)
        assert (np.asarray(ids)[:, 0] == gt_ids[:, 0]).mean() >= 0.9

    def test_save_load(self, corpus, queries, tmp_path):
        idx = IVFSQIndex.train(corpus, nlist=8, seed=1, metric="dot")
        idx.add(corpus)
        p = idx.save(str(tmp_path / "ivfsq"))
        idx2 = IVFSQIndex.load(p)
        assert idx2.ntotal == idx.ntotal and idx2.metric == "dot"
        a_i, a_s = idx.search(queries, k=5, nprobe=4)
        b_i, b_s = idx2.search(queries, k=5, nprobe=4)
        np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
        np.testing.assert_allclose(np.asarray(a_s), np.asarray(b_s))

    def test_wrong_kind_load(self, corpus, tmp_path):
        idx = IVFSQIndex.train(corpus[:200], nlist=4, seed=1)
        idx.add(corpus[:200])
        p = idx.save(str(tmp_path / "x"))
        with pytest.raises(InvalidData):
            IVFFlatIndex.load(p)

    def test_errors(self, corpus):
        from vq_tpu.models.sq import PerDimScalarQuantizer

        idx = IVFSQIndex.train(corpus, nlist=8, seed=1)
        with pytest.raises(EmptyInput):
            idx.search(corpus[:2])
        with pytest.raises(DimensionMismatch):
            idx.add(np.zeros((2, 16), np.float32))
        sq16 = PerDimScalarQuantizer.from_data(
            corpus[:, :16].astype(np.float32)
        )
        with pytest.raises(DimensionMismatch):
            IVFSQIndex(idx.coarse, sq16)
        with pytest.raises(InvalidParameter):
            IVFSQIndex(idx.coarse, object())  # type: ignore[arg-type]


class TestRebalance:
    """List split/retire rebalancing for the Flat/SQ variants."""

    @pytest.fixture(scope="class")
    def skewed(self, rng):
        # Zipf-ish cluster sizes around 12 natural centers.
        centers = rng.normal(0, 4, (12, 24)).astype(np.float32)
        p = 1.0 / np.arange(1, 13) ** 1.5
        which = rng.choice(12, size=5000, p=p / p.sum())
        return (
            centers[which] + rng.normal(0, 0.2, (5000, 24))
        ).astype(np.float32)

    def test_flat_rebalance_exact_and_capped(self, skewed):
        idx = IVFFlatIndex.train(skewed, nlist=12, seed=5, max_list_size=600)
        idx.add(skewed)
        assert idx.bucket_stats()["overflow_dropped"] > 0
        info = idx.rebalance(target_max=600)
        assert info["split"] > 0
        st = idx.bucket_stats()
        assert st["max"] <= 600 and st["overflow_dropped"] == 0
        # Raw rows are untouched -> full-probe search is still exact.
        q = skewed[:10] + np.float32(0.01)
        ids, d = idx.search(q, k=5, nprobe=idx.nlist)
        gt_ids, gt_d = brute_l2(q, skewed, 5)
        np.testing.assert_array_equal(np.asarray(ids), gt_ids)
        np.testing.assert_allclose(np.asarray(d), gt_d, atol=1e-3)

    def test_sq_rebalance_consistent(self, skewed):
        idx = IVFSQIndex.train(skewed, nlist=12, seed=5)
        idx.add(skewed)
        before = idx.bucket_stats()["max"]
        info = idx.rebalance(target_max=600)
        assert info["split"] > 0
        st = idx.bucket_stats()
        assert st["max"] <= 600 < before
        # Codes were re-encoded against the new centroids: full-probe
        # search must still equal brute force over the decoded rows.
        y = np.asarray(idx.reconstruct(np.arange(idx.ntotal)))
        q = skewed[:10] + np.float32(0.01)
        ids, d = idx.search(q, k=5, nprobe=idx.nlist)
        gt_ids, gt_d = brute_l2(q, y, 5)
        np.testing.assert_array_equal(np.asarray(ids), gt_ids)
        np.testing.assert_allclose(np.asarray(d), gt_d, atol=1e-3)
        # Re-encoding against nearer centroids must not hurt recon MSE.
        mse = np.mean((y - skewed) ** 2)
        assert mse < 1e-3

    def test_retire_small_lists(self, skewed):
        idx = IVFFlatIndex.train(skewed, nlist=12, seed=5)
        idx.add(skewed)
        info = idx.rebalance(target_max=5000, min_size=50)
        st = idx.bucket_stats()
        assert idx.nlist <= 12
        assert st["min"] >= 1  # no empty/underfull probe targets left

    def test_empty_raises(self, skewed):
        idx = IVFFlatIndex.train(skewed, nlist=4, seed=5)
        with pytest.raises(EmptyInput):
            idx.rebalance()


class TestIVFRQ:
    """Full-probe IVF-RQ must equal brute force over decoded rows —
    the probe-independent-tables trick (stored c·ŷ cross-terms) must not
    change any distance."""

    def _decoded(self, idx):
        return np.asarray(idx.reconstruct(np.arange(idx.ntotal)))

    def test_full_probe_matches_decoded_bruteforce(self, corpus, queries):
        from vq_tpu import IVFRQIndex

        idx = IVFRQIndex.train(
            corpus, nlist=12, num_stages=2, num_centroids=32,
            max_iters=4, seed=5,
        )
        idx.add(corpus)
        ids, d = idx.search(queries, k=8, nprobe=12)
        ref_ids, ref_d = brute_l2(queries, self._decoded(idx), 8)
        np.testing.assert_allclose(
            np.asarray(d), ref_d, rtol=2e-4, atol=2e-3
        )
        agree = (np.asarray(ids) == ref_ids).mean()
        assert agree > 0.95  # near-tie order flips only

    def test_non_residual_matches_decoded_bruteforce(self, corpus, queries):
        from vq_tpu import IVFRQIndex

        idx = IVFRQIndex.train(
            corpus, nlist=8, num_stages=2, num_centroids=16,
            max_iters=3, seed=6, by_residual=False,
        )
        idx.add(corpus)
        ids, d = idx.search(queries, k=5, nprobe=8)
        ref_ids, ref_d = brute_l2(queries, self._decoded(idx), 5)
        np.testing.assert_allclose(
            np.asarray(d), ref_d, rtol=2e-4, atol=2e-3
        )

    def test_dot_matches_decoded_bruteforce(self, corpus, queries):
        from vq_tpu import IVFRQIndex

        idx = IVFRQIndex.train(
            corpus, nlist=8, num_stages=2, num_centroids=16,
            max_iters=3, seed=7, metric="dot",
        )
        idx.add(corpus)
        ids, s = idx.search(queries, k=5, nprobe=8)
        ref_ids, ref_s = brute_dot(queries, self._decoded(idx), 5)
        np.testing.assert_allclose(
            np.asarray(s), ref_s, rtol=2e-4, atol=2e-3
        )

    def test_residual_beats_ivfpq_at_equal_bytes(self, corpus, queries):
        """RQ 4x256 (4 B) should reconstruct at least as well as it does
        raw — sanity that residual coding helps; cross-index accuracy
        comparisons live in the serving bench."""
        from vq_tpu import IVFRQIndex

        res = IVFRQIndex.train(
            corpus, nlist=12, num_stages=4, num_centroids=64,
            max_iters=4, seed=8,
        )
        res.add(corpus)
        raw = IVFRQIndex.train(
            corpus, nlist=12, num_stages=4, num_centroids=64,
            max_iters=4, seed=8, by_residual=False,
        )
        raw.add(corpus)
        mse_res = np.mean(
            (self._decoded(res) - corpus) ** 2
        )
        mse_raw = np.mean((self._decoded(raw) - corpus) ** 2)
        assert mse_res <= mse_raw * 1.05

    def test_beam_encoding_not_worse(self, corpus):
        from vq_tpu import IVFRQIndex

        g = IVFRQIndex.train(
            corpus, nlist=8, num_stages=3, num_centroids=16,
            max_iters=3, seed=9, beam=1,
        )
        g.add(corpus[:1000])
        b = IVFRQIndex.train(
            corpus, nlist=8, num_stages=3, num_centroids=16,
            max_iters=3, seed=9, beam=4,
        )
        b.add(corpus[:1000])
        mse_g = np.mean((np.asarray(
            g.reconstruct(np.arange(1000))) - corpus[:1000]) ** 2)
        mse_b = np.mean((np.asarray(
            b.reconstruct(np.arange(1000))) - corpus[:1000]) ** 2)
        assert mse_b <= mse_g * 1.001

    def test_save_load(self, corpus, queries, tmp_path):
        from vq_tpu import IVFRQIndex

        idx = IVFRQIndex.train(
            corpus, nlist=8, num_stages=2, num_centroids=16,
            max_iters=3, seed=10, beam=2,
        )
        idx.add(corpus[:500])
        p = idx.save(str(tmp_path / "ivfrq.npz"))
        idx2 = IVFRQIndex.load(p)
        assert idx2.beam == 2 and idx2.ntotal == 500
        ids1, d1 = idx.search(queries, k=4, nprobe=8)
        ids2, d2 = idx2.search(queries, k=4, nprobe=8)
        np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)

    def test_remove_ids_and_rebalance(self, corpus):
        from vq_tpu import IVFRQIndex

        idx = IVFRQIndex.train(
            corpus, nlist=6, num_stages=2, num_centroids=16,
            max_iters=3, seed=11,
        )
        idx.add(corpus[:800])
        assert idx.remove_ids([0, 1, 2]) == 3
        assert idx.ntotal == 797
        ids, d = idx.search(corpus[10:12], k=3, nprobe=6)
        assert np.asarray(ids).shape == (2, 3)
        info = idx.rebalance(target_max=128, max_iters=3)
        assert idx.bucket_stats()["overflow_dropped"] == 0
        # full probe still matches decoded brute force after rebalance
        dec = np.asarray(idx.reconstruct(np.arange(idx.ntotal)))
        q = corpus[20:24]
        ids2, d2 = idx.search(q, k=4, nprobe=idx.nlist)
        ref_ids, ref_d = brute_l2(q, dec, 4)
        np.testing.assert_allclose(
            np.asarray(d2), ref_d, rtol=2e-4, atol=2e-3
        )

    def test_factory_spec(self, corpus):
        from vq_tpu import index_factory

        idx = index_factory(32, "IVF8,RQ2x4", metric="l2").train(
            corpus, max_iters=3
        )
        idx.add(corpus[:500])
        ids, _ = idx.search(corpus[:3], k=4, nprobe=8)
        assert np.asarray(ids).shape == (3, 4)

    def test_errors(self, corpus):
        from vq_tpu import IVFRQIndex
        from vq_tpu.models.rq import ResidualQuantizer, rq_train

        rq = ResidualQuantizer(
            codebooks=rq_train(corpus, 2, 8, max_iters=2)
        )
        with pytest.raises(InvalidParameter):
            IVFRQIndex(corpus[:4], rq, beam=0)
        with pytest.raises(InvalidParameter):
            IVFRQIndex(corpus[:4], object())
        idx = IVFRQIndex(corpus[:4], rq)
        with pytest.raises(EmptyInput):
            idx.search(corpus[:1])
        with pytest.raises(DimensionMismatch):
            idx.add(corpus[:2, :16])


class TestIVFRangeSearch:
    """range_search on the IVF scan ladder: full-probe results must equal
    the brute-force radius scan over the decoded corpus; partial probes
    return a subset with true probed-hit counts."""

    def _decoded(self, idx, n):
        return np.asarray(idx.reconstruct(np.arange(n)))

    def _brute_hits(self, q, y, radius):
        d = np.sum((y[None] - q[:, None]) ** 2, axis=-1)
        return d, d <= radius

    def _check_full_probe(self, idx, q, radius, max_results=256):
        n = idx.ntotal
        y = self._decoded(idx, n)
        d, hits = self._brute_hits(np.asarray(q), y, radius)
        ids, vals, counts = idx.range_search(
            q, radius, nprobe=idx.nlist, max_results=max_results
        )
        ids, vals, counts = (np.asarray(a) for a in (ids, vals, counts))
        np.testing.assert_array_equal(counts, hits.sum(axis=1))
        for r in range(q.shape[0]):
            got = set(ids[r][ids[r] >= 0].tolist())
            want = set(np.where(hits[r])[0].tolist())
            assert got == want  # counts <= max_results here
            for c in range(max_results):
                i = ids[r, c]
                if i < 0:
                    assert np.isinf(vals[r, c])
                else:
                    np.testing.assert_allclose(
                        vals[r, c], d[r, i], rtol=1e-4, atol=1e-4
                    )

    def test_ivf_flat_full_probe(self, corpus, queries):
        idx = IVFFlatIndex.train(corpus, nlist=10, seed=1)
        idx.add(corpus)
        self._check_full_probe(idx, queries[:6], radius=20.0)

    def test_ivf_sq_full_probe(self, corpus, queries):
        idx = IVFSQIndex.train(corpus, nlist=10, seed=2)
        idx.add(corpus)
        self._check_full_probe(idx, queries[:6], radius=20.0)

    def test_ivf_rq_full_probe(self, corpus, queries):
        from vq_tpu import IVFRQIndex

        idx = IVFRQIndex.train(
            corpus, nlist=10, num_stages=2, num_centroids=16,
            max_iters=3, seed=3,
        )
        idx.add(corpus)
        self._check_full_probe(idx, queries[:6], radius=20.0)

    def test_partial_probe_is_subset(self, corpus, queries):
        idx = IVFFlatIndex.train(corpus, nlist=10, seed=4)
        idx.add(corpus)
        q = queries[:8]
        ids_f, _, counts_f = idx.range_search(
            q, 15.0, nprobe=idx.nlist, max_results=512
        )
        ids_p, _, counts_p = idx.range_search(
            q, 15.0, nprobe=2, max_results=512
        )
        assert (np.asarray(counts_p) <= np.asarray(counts_f)).all()
        for r in range(q.shape[0]):
            full = set(np.asarray(ids_f)[r][np.asarray(ids_f)[r] >= 0].tolist())
            part = set(np.asarray(ids_p)[r][np.asarray(ids_p)[r] >= 0].tolist())
            assert part <= full

    def test_counts_exceed_cap(self, corpus):
        idx = IVFFlatIndex.train(corpus, nlist=8, seed=5)
        idx.add(corpus)
        # Huge radius: every probed row is a hit; counts report the true
        # total even though only max_results come back.
        ids, vals, counts = idx.range_search(
            corpus[:3], 1e9, nprobe=8, max_results=16
        )
        assert ids.shape == (3, 16)
        assert (np.asarray(counts) == idx.ntotal).all()
        assert (np.asarray(ids) >= 0).all()

    def test_dot_metric_threshold(self, corpus, queries):
        idx = IVFFlatIndex.train(corpus, nlist=10, seed=6, metric="dot")
        idx.add(corpus)
        q = np.asarray(queries[:5])
        r = 10.0
        ids, vals, counts = idx.range_search(
            q, r, nprobe=idx.nlist, max_results=1024
        )
        s = q @ np.asarray(self._decoded(idx, idx.ntotal)).T
        want_counts = (s >= r).sum(axis=1)
        np.testing.assert_array_equal(np.asarray(counts), want_counts)
        vals = np.asarray(vals)
        hits = np.asarray(ids) >= 0
        assert (vals[hits] >= r - 1e-4).all()
        assert np.isneginf(vals[~hits]).all()

    def test_empty_and_bad_args(self, corpus):
        idx = IVFFlatIndex.train(corpus, nlist=4, seed=7)
        with pytest.raises(EmptyInput):
            idx.range_search(corpus[:2], 1.0)
        idx.add(corpus[:64])
        with pytest.raises(InvalidParameter):
            idx.range_search(corpus[:2], 1.0, max_results=0)


def test_spherical_coarse_training(corpus):
    """spherical=True trains a unit-norm coarse quantizer (faiss
    Clustering spherical analog) on every IVF train constructor."""
    x = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    idx = IVFFlatIndex.train(x, nlist=8, seed=1, spherical=True,
                             metric="dot")
    norms = np.linalg.norm(np.asarray(idx.coarse), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    idx.add(x)
    ids, _ = idx.search(x[:3], k=2)
    assert (np.asarray(ids)[:, 0] == np.arange(3)).all()


def test_rebalance_extreme_skew_does_not_crash(corpus):
    """Review regression: a list longer than target_max² used to make the
    split part count exceed the fixed-size k-means subsample (lloyd
    raises n < k). 600 rows piled onto ~1 list with target_max=8."""
    r = np.random.default_rng(99)
    pile = corpus[:1] + r.normal(0, 0.01, (600, corpus.shape[1])).astype(
        np.float32
    )
    idx = IVFFlatIndex.train(corpus[:200], nlist=8, seed=1)
    idx.add(np.concatenate([corpus[:50], pile]))
    info = idx.rebalance(target_max=8, rounds=2)
    assert info["split"] >= 1
    ids, _ = idx.search(corpus[:3], k=2, nprobe=idx.nlist)
    assert (np.asarray(ids)[:, 0] >= 0).all()

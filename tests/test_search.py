"""Index layer: PQIndex, BinaryIndex, and SQIndex add/search/save/load."""

import numpy as np
import pytest

from vq_tpu import ProductQuantizer
from vq_tpu.errors import (
    DimensionMismatch,
    EmptyInput,
    InvalidData,
    InvalidParameter,
)
from vq_tpu.search import BinaryIndex, PQIndex, SQIndex


@pytest.fixture(scope="module")
def corpus(rng):
    return rng.random((3000, 32), dtype=np.float32)


@pytest.fixture(scope="module")
def pq(corpus):
    return ProductQuantizer(corpus, 4, 32, max_iters=8)


def exact_top1(queries, corpus):
    d = np.sum(
        (corpus[None, :, :] - queries[:, None, :]) ** 2, axis=-1
    )
    return np.argmin(d, axis=1)


class TestPQIndex:
    def test_add_search(self, corpus, pq):
        idx = PQIndex(pq)
        idx.add(corpus[:2000])
        idx.add(corpus[2000:])
        assert idx.ntotal == 3000
        assert idx.code_bytes_per_vector == 4
        ids, dist = idx.search(corpus[:10], k=5)
        ids, dist = np.asarray(ids), np.asarray(dist)
        assert ids.shape == (10, 5)
        assert (np.diff(dist, axis=1) >= -1e-6).all()

    def test_rerank_finds_exact_nn(self, corpus, pq):
        idx = PQIndex(pq, keep_corpus=True)
        idx.add(corpus)
        queries = corpus[100:110]
        ids, dist = idx.search(queries, k=1, rerank=100)
        np.testing.assert_array_equal(
            np.asarray(ids)[:, 0], np.arange(100, 110)
        )
        # "exact" self-distances carry the matmul-form f32 floor (~2e-6
        # squared -> ~1.5e-3 after sqrt)
        assert np.asarray(dist).max() < 5e-3

    def test_rerank_requires_corpus(self, corpus, pq):
        idx = PQIndex(pq)
        idx.add(corpus[:100])
        with pytest.raises(InvalidData):
            idx.search(corpus[:2], rerank=10)

    def test_reconstruct(self, corpus, pq):
        idx = PQIndex(pq)
        idx.add(corpus[:50])
        rec = np.asarray(idx.reconstruct([0, 7]))
        np.testing.assert_allclose(
            rec, np.asarray(pq.decode(pq.encode(corpus[:50])))[[0, 7]]
        )

    def test_save_load(self, corpus, pq, tmp_path):
        idx = PQIndex(pq, keep_corpus=True)
        idx.add(corpus[:500])
        p = idx.save(str(tmp_path / "idx"))
        idx2 = PQIndex.load(p)
        assert idx2.ntotal == 500
        a, _ = idx.search(corpus[:5], k=3, rerank=20)
        b, _ = idx2.search(corpus[:5], k=3, rerank=20)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_empty_search_raises(self, pq):
        with pytest.raises(EmptyInput):
            PQIndex(pq).search(np.zeros((1, 32), np.float32))

    def test_dim_check(self, pq):
        with pytest.raises(DimensionMismatch):
            PQIndex(pq).add(np.zeros((2, 16), np.float32))


class TestBinaryIndex:
    def test_add_search_self(self, corpus):
        idx = BinaryIndex(dim=32, threshold=0.5)
        idx.add(corpus)
        ids, dist = idx.search(corpus[:10], k=1)
        # each query's own packed code is at Hamming distance 0
        assert (np.asarray(dist)[:, 0] == 0).all()

    def test_rerank_exact(self, corpus):
        idx = BinaryIndex(dim=32, threshold=0.5, keep_corpus=True)
        idx.add(corpus)
        ids, dist = idx.search(corpus[5:8], k=1, rerank=200)
        np.testing.assert_array_equal(np.asarray(ids)[:, 0], [5, 6, 7])

    def test_save_load(self, corpus, tmp_path):
        idx = BinaryIndex(dim=32, threshold=0.5)
        idx.add(corpus[:100])
        p = idx.save(str(tmp_path / "bidx"))
        idx2 = BinaryIndex.load(p)
        assert idx2.ntotal == 100
        a, _ = idx.search(corpus[:4], k=3)
        b, _ = idx2.search(corpus[:4], k=3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_wrong_kind_load(self, corpus, pq, tmp_path):
        pidx = PQIndex(pq)
        pidx.add(corpus[:10])
        p = pidx.save(str(tmp_path / "x"))
        with pytest.raises(InvalidData):
            BinaryIndex.load(p)


class TestSQIndex:
    def _decoded_bruteforce(self, idx, queries, metric, k):
        """Exact top-k against the decoded (dequantized) corpus."""
        import jax.numpy as jnp

        from vq_tpu.ops.distance import Metric, pairwise

        y = np.asarray(idx.reconstruct(np.arange(idx.ntotal)))
        if metric == "dot":
            s = queries @ y.T
            ids = np.argsort(-s, kind="stable", axis=1)[:, :k]
            return ids, np.take_along_axis(s, ids, axis=1)
        d = np.asarray(pairwise(jnp.asarray(queries), jnp.asarray(y), Metric(metric)))
        ids = np.argsort(d, kind="stable", axis=1)[:, :k]
        return ids, np.take_along_axis(d, ids, axis=1)

    def test_add_search(self, corpus):
        idx = SQIndex.from_data(corpus)
        assert idx.ntotal == 3000
        assert idx.code_bytes_per_vector == 32  # one u8 per dimension
        ids, dist = idx.search(corpus[:10], k=5)
        ids, dist = np.asarray(ids), np.asarray(dist)
        assert ids.shape == (10, 5)
        assert (np.diff(dist, axis=1) >= -1e-6).all()
        # asymmetric scan distances are EXACT decoded-corpus distances
        gt_ids, gt_d = self._decoded_bruteforce(
            idx, corpus[:10], "squared_euclidean", 5
        )
        np.testing.assert_array_equal(ids, gt_ids)
        np.testing.assert_allclose(dist, gt_d, atol=1e-4)

    @pytest.mark.parametrize(
        "metric", ["squared_euclidean", "euclidean", "cosine", "dot"]
    )
    def test_scan_matches_decoded_bruteforce(self, corpus, metric):
        idx = SQIndex.from_data(corpus, metric=metric)
        queries = corpus[50:60] + 0.01
        ids, vals = idx.search(queries, k=7)
        gt_ids, gt_vals = self._decoded_bruteforce(idx, queries, metric, 7)
        np.testing.assert_array_equal(np.asarray(ids), gt_ids)
        np.testing.assert_allclose(np.asarray(vals), gt_vals, atol=1e-3)

    def test_dot_scores_descend(self, corpus):
        idx = SQIndex.from_data(corpus, metric="dot")
        _, s = idx.search(corpus[:6], k=8)
        assert (np.diff(np.asarray(s), axis=1) <= 1e-6).all()

    def test_sq8_top1_recall_vs_raw(self, corpus):
        # 8-bit/dim codes should preserve almost every exact-NN answer.
        idx = SQIndex.from_data(corpus)
        queries = corpus[:64] + np.float32(0.003)
        ids, _ = idx.search(queries, k=1)
        recall = (np.asarray(ids)[:, 0] == exact_top1(queries, corpus)).mean()
        assert recall >= 0.95

    def test_chunked_scan_matches_unchunked(self, corpus):
        idx = SQIndex.from_data(corpus)
        a_i, a_d = idx.search(corpus[:8], k=6, chunk=256)  # 12 blocks, padded
        b_i, b_d = idx.search(corpus[:8], k=6)
        np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
        np.testing.assert_allclose(np.asarray(a_d), np.asarray(b_d), atol=1e-5)

    def test_incremental_add(self, corpus):
        whole = SQIndex.from_data(corpus)
        parts = SQIndex(whole.sq)
        parts.add(corpus[:1000])
        parts.add(corpus[1000:])
        assert parts.ntotal == 3000
        a, _ = whole.search(corpus[:5], k=4)
        b, _ = parts.search(corpus[:5], k=4)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rerank_finds_exact_nn(self, corpus):
        idx = SQIndex.from_data(corpus, keep_corpus=True)
        ids, dist = idx.search(corpus[100:110], k=1, rerank=50)
        np.testing.assert_array_equal(
            np.asarray(ids)[:, 0], np.arange(100, 110)
        )
        assert np.asarray(dist).max() < 5e-3

    def test_rerank_requires_corpus(self, corpus):
        idx = SQIndex.from_data(corpus)
        with pytest.raises(InvalidData):
            idx.search(corpus[:2], rerank=10)

    def test_manhattan_rejected(self, corpus):
        with pytest.raises(InvalidParameter):
            SQIndex.from_data(corpus, metric="manhattan")

    def test_save_load(self, corpus, tmp_path):
        idx = SQIndex.from_data(corpus, metric="cosine", keep_corpus=True)
        p = idx.save(str(tmp_path / "sqidx"))
        idx2 = SQIndex.load(p)
        assert idx2.ntotal == 3000 and idx2.metric == "cosine"
        a, _ = idx.search(corpus[:5], k=3, rerank=20)
        b, _ = idx2.search(corpus[:5], k=3, rerank=20)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_wrong_kind_load(self, corpus, tmp_path):
        idx = SQIndex.from_data(corpus[:50])
        p = idx.save(str(tmp_path / "y"))
        with pytest.raises(InvalidData):
            PQIndex.load(p)

    def test_empty_and_dim_checks(self, corpus):
        from vq_tpu.models.sq import PerDimScalarQuantizer

        empty = SQIndex(PerDimScalarQuantizer.from_data(corpus))
        with pytest.raises(EmptyInput):
            empty.search(corpus[:2])
        with pytest.raises(DimensionMismatch):
            empty.add(np.zeros((2, 16), np.float32))
        full = SQIndex.from_data(corpus[:50])
        with pytest.raises(DimensionMismatch):
            full.search(np.zeros((2, 16), np.float32))


class TestPackedSQIndex:
    """Sub-byte SQ storage (the faiss SQ4 analog): levels <= 16 pack two
    codes per byte, unpacked on the VPU inside the scan — search results
    must equal exact distances to the dequantized corpus."""

    def _mk(self, corpus, levels, **kw):
        from vq_tpu import PerDimScalarQuantizer

        idx = SQIndex(
            PerDimScalarQuantizer.from_data(corpus, levels), **kw
        )
        idx.add(corpus)
        return idx

    @pytest.mark.parametrize("levels,bits", [(16, 4), (4, 2), (2, 1)])
    def test_pack_policy_and_width(self, corpus, levels, bits):
        idx = self._mk(corpus, levels)
        assert idx.pack_bits == bits
        d = corpus.shape[1]
        assert idx._codes.shape[1] == -(-d * bits // 8)
        assert idx.code_bytes_per_vector == -(-d * bits // 8)

    def test_matches_decoded_bruteforce(self, corpus):
        idx = self._mk(corpus, 16)
        q = corpus[:8] + 0.01
        ids, d = idx.search(q, 10)
        y = np.asarray(idx.reconstruct(np.arange(idx.ntotal)))
        ref = np.sum((y[None] - q[:, None]) ** 2, axis=-1)
        ref_d = np.sort(ref, axis=1)[:, :10]
        np.testing.assert_allclose(
            np.asarray(d), ref_d, rtol=1e-4, atol=1e-4
        )

    def test_odd_dim_pads_one_byte(self):
        from vq_tpu import PerDimScalarQuantizer

        r = np.random.default_rng(21)
        x = r.normal(size=(300, 33)).astype(np.float32)
        idx = SQIndex(PerDimScalarQuantizer.from_data(x, 16))
        idx.add(x)
        assert idx._codes.shape[1] == 17
        ids, _ = idx.search(x[:4], 3)
        assert int(np.asarray(ids)[0, 0]) == 0

    def test_save_load_round_trip(self, corpus, tmp_path):
        idx = self._mk(corpus, 16)
        q = corpus[:6] + 0.01
        i1, d1 = idx.search(q, 5)
        ld = SQIndex.load(idx.save(str(tmp_path / "sq4")))
        assert ld.pack_bits == 4
        i2, d2 = ld.search(q, 5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_sharded_matches(self, corpus):
        from vq_tpu.parallel import sharded_flat_search

        idx = self._mk(corpus, 16)
        q = corpus[:6] + 0.01
        i1, d1 = idx.search(q, 5)
        i2, d2 = sharded_flat_search(idx, q, k=5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_rerank_and_range_search(self, corpus):
        idx = self._mk(corpus, 16, keep_corpus=True)
        q = corpus[:6] + 0.01
        ids, d = idx.search(q, 5, rerank=50)
        exact = np.sum((corpus[None] - q[:, None]) ** 2, axis=-1)
        best = np.argsort(exact, kind="stable", axis=1)[:, 0]
        np.testing.assert_array_equal(np.asarray(ids)[:, 0], best)
        rids, rd, counts = idx.range_search(q, 5.0, max_results=32)
        assert (np.asarray(counts) >= 1).all()

    def test_factory_sq4(self, corpus):
        from vq_tpu import index_factory

        f = index_factory(corpus.shape[1], "SQ4")
        f.train(corpus)
        f.add(corpus)
        ids, _ = f.search(corpus[:4] + 0.01, 3)
        assert np.asarray(ids).shape == (4, 3)


class TestPackedPQIndex:
    """Sub-byte packed code storage (the faiss nbits<8 IndexPQ analog)."""

    @pytest.fixture(scope="class")
    def pq16(self, corpus):
        return ProductQuantizer(corpus, 8, 16, max_iters=6)

    def test_roundtrip_all_widths(self, rng):
        from vq_tpu.ops.packing import pack_codes, unpack_codes

        for nbits in (1, 2, 4, 8):
            for m in (1, 3, 8, 17):
                codes = rng.integers(0, 1 << nbits, size=(13, m)).astype(
                    np.uint8
                )
                packed = np.asarray(pack_codes(codes, nbits))
                assert packed.shape == (13, -(-m * nbits // 8))
                back = np.asarray(unpack_codes(packed, nbits, m))
                np.testing.assert_array_equal(back, codes)

    def test_auto_packs_at_k16(self, corpus, pq16):
        idx = PQIndex(pq16)
        idx.add(corpus)
        assert idx.pack_bits == 4
        assert idx.code_bytes_per_vector == 4  # 8 subspaces x 4 bits
        assert idx._codes.shape == (3000, 4)

    def test_packed_search_matches_unpacked(self, corpus, pq16):
        packed = PQIndex(pq16)
        plain = PQIndex(pq16, packed=False)
        packed.add(corpus)
        plain.add(corpus)
        assert plain.code_bytes_per_vector == 8
        ia, da = packed.search(corpus[:12], k=6)
        ib, db = plain.search(corpus[:12], k=6)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-5)

    def test_packed_chunked_scan_matches(self, corpus, pq16):
        idx = PQIndex(pq16)
        idx.add(corpus)
        ia, _ = pq16.adc_search(
            corpus[:6], idx._codes, k=5, chunk=512, pack_bits=4
        )
        plain = PQIndex(pq16, packed=False)
        plain.add(corpus)
        ib, _ = pq16.adc_search(corpus[:6], plain._codes, k=5, chunk=512)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))

    def test_reconstruct_and_save_load(self, corpus, pq16, tmp_path):
        idx = PQIndex(pq16, keep_corpus=True)
        idx.add(corpus[:400])
        plain = PQIndex(pq16, packed=False)
        plain.add(corpus[:400])
        np.testing.assert_array_equal(
            np.asarray(idx.reconstruct([0, 17, 399])),
            np.asarray(plain.reconstruct([0, 17, 399])),
        )
        p = idx.save(str(tmp_path / "pidx"))
        idx2 = PQIndex.load(p)
        assert idx2.pack_bits == 4
        a, _ = idx.search(corpus[:5], k=3, rerank=20)
        b, _ = idx2.search(corpus[:5], k=3, rerank=20)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_packed_requires_small_k(self, corpus, pq):
        # pq fixture has k=32 -> needs >4 bits
        with pytest.raises(InvalidParameter):
            PQIndex(pq, packed=True)
        assert PQIndex(pq).pack_bits == 8  # auto keeps u8


def test_binary_index_rerank_without_corpus_raises():
    # Round-2 regression (VERDICT r1 #9): BinaryIndex.search silently fell
    # back to Hamming when rerank was requested without a kept corpus;
    # PQIndex raises InvalidData for the same misuse — now both do.
    rng = np.random.default_rng(11)
    idx = BinaryIndex(32)
    idx.add(rng.normal(0, 1, (100, 32)).astype(np.float32))
    with pytest.raises(InvalidData):
        idx.search(rng.normal(0, 1, (4, 32)).astype(np.float32), k=3, rerank=10)


class TestRQIndex:
    """Flat ADC over additive codes (faiss IndexResidualQuantizer analog)."""

    @pytest.fixture(scope="class")
    def rq(self, corpus):
        from vq_tpu.models.rq import ResidualQuantizer

        return ResidualQuantizer(corpus, 4, 32, max_iters=8)

    def _decoded_bruteforce(self, idx, queries, metric, k):
        """Exact top-k against the decoded (dequantized) corpus."""
        import jax.numpy as jnp

        from vq_tpu.ops.distance import Metric, pairwise

        y = np.asarray(idx.reconstruct(np.arange(idx.ntotal)))
        if metric == "dot":
            s = queries @ y.T
            ids = np.argsort(-s, kind="stable", axis=1)[:, :k]
            return ids, np.take_along_axis(s, ids, axis=1)
        d = np.asarray(
            pairwise(jnp.asarray(queries), jnp.asarray(y), Metric(metric))
        )
        ids = np.argsort(d, kind="stable", axis=1)[:, :k]
        return ids, np.take_along_axis(d, ids, axis=1)

    def test_add_search(self, corpus, rq):
        from vq_tpu.search import RQIndex

        idx = RQIndex(rq)
        idx.add(corpus[:2000])
        idx.add(corpus[2000:])
        assert idx.ntotal == 3000
        assert idx.code_bytes_per_vector == 4  # one u8 per stage
        ids, dist = idx.search(corpus[:10], k=5)
        ids, dist = np.asarray(ids), np.asarray(dist)
        assert ids.shape == (10, 5)
        assert (np.diff(dist, axis=1) >= -1e-6).all()
        # asymmetric scan distances are EXACT decoded-corpus distances
        gt_ids, gt_d = self._decoded_bruteforce(
            idx, corpus[:10], "squared_euclidean", 5
        )
        np.testing.assert_array_equal(ids, gt_ids)
        np.testing.assert_allclose(dist, gt_d, atol=1e-4)

    @pytest.mark.parametrize(
        "metric", ["squared_euclidean", "euclidean", "cosine", "dot"]
    )
    def test_scan_matches_decoded_bruteforce(self, corpus, rq, metric):
        from vq_tpu.search import RQIndex

        idx = RQIndex(rq, metric=metric)
        idx.add(corpus)
        queries = corpus[50:60] + 0.01
        ids, vals = idx.search(queries, k=7)
        gt_ids, gt_vals = self._decoded_bruteforce(idx, queries, metric, 7)
        np.testing.assert_array_equal(np.asarray(ids), gt_ids)
        np.testing.assert_allclose(np.asarray(vals), gt_vals, atol=1e-3)

    def test_chunked_scan_matches_unchunked(self, corpus, rq):
        from vq_tpu.search import RQIndex

        idx = RQIndex(rq)
        idx.add(corpus)
        a_i, a_d = idx.search(corpus[:8], k=6, chunk=256)  # padded blocks
        b_i, b_d = idx.search(corpus[:8], k=6)
        np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
        np.testing.assert_allclose(
            np.asarray(a_d), np.asarray(b_d), atol=1e-5
        )

    def test_beam_add_lowers_distance(self, corpus, rq):
        # Beam-encoded codes reconstruct at least as well as greedy on
        # average -> mean top-1 self-distance should not increase.
        from vq_tpu.search import RQIndex

        greedy = RQIndex(rq)
        greedy.add(corpus[:500])
        beam = RQIndex(rq, beam=4)
        beam.add(corpus[:500])
        _, dg = greedy.search(corpus[:500], k=1)
        _, db = beam.search(corpus[:500], k=1)
        assert np.asarray(db).mean() <= np.asarray(dg).mean() + 1e-6

    def test_rerank_finds_exact_nn(self, corpus, rq):
        from vq_tpu.search import RQIndex

        idx = RQIndex(rq, keep_corpus=True)
        idx.add(corpus)
        ids, dist = idx.search(corpus[100:110], k=1, rerank=50)
        np.testing.assert_array_equal(
            np.asarray(ids)[:, 0], np.arange(100, 110)
        )
        assert np.asarray(dist).max() < 5e-3

    def test_rerank_requires_corpus(self, corpus, rq):
        from vq_tpu.search import RQIndex

        idx = RQIndex(rq)
        idx.add(corpus[:100])
        with pytest.raises(InvalidData):
            idx.search(corpus[:2], rerank=10)

    def test_manhattan_rejected(self, rq):
        from vq_tpu.search import RQIndex

        with pytest.raises(InvalidParameter):
            RQIndex(rq, metric="manhattan")

    def test_save_load(self, corpus, rq, tmp_path):
        from vq_tpu.search import RQIndex

        idx = RQIndex(rq, metric="cosine", keep_corpus=True, beam=2)
        idx.add(corpus)
        p = idx.save(str(tmp_path / "rqidx"))
        idx2 = RQIndex.load(p)
        assert idx2.ntotal == 3000 and idx2.metric == "cosine"
        assert idx2.beam == 2
        a, _ = idx.search(corpus[:5], k=3, rerank=20)
        b, _ = idx2.search(corpus[:5], k=3, rerank=20)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_wrong_kind_load(self, corpus, rq, tmp_path):
        from vq_tpu.search import RQIndex

        idx = RQIndex(rq)
        idx.add(corpus[:50])
        p = idx.save(str(tmp_path / "z"))
        with pytest.raises(InvalidData):
            SQIndex.load(p)

    def test_empty_and_dim_checks(self, corpus, rq):
        from vq_tpu.search import RQIndex

        empty = RQIndex(rq)
        with pytest.raises(EmptyInput):
            empty.search(corpus[:2])
        with pytest.raises(DimensionMismatch):
            empty.add(np.zeros((2, 16), np.float32))
        full = RQIndex(rq)
        full.add(corpus[:50])
        with pytest.raises(DimensionMismatch):
            full.search(np.zeros((2, 16), np.float32))

    def test_requires_rq(self, pq):
        from vq_tpu.search import RQIndex

        with pytest.raises(InvalidParameter):
            RQIndex(pq)


class TestRemoveIds:
    """faiss remove_ids contract: drop positions, renumber sequentially.

    Ground truth for every index: a fresh index (same quantizer) over the
    kept rows must return identical search results.
    """

    def _kept(self, corpus, drop):
        keep = np.setdiff1d(np.arange(len(corpus)), drop)
        return corpus[keep]

    def test_pq_index(self, corpus, pq):
        idx = PQIndex(pq, keep_corpus=True)
        idx.add(corpus[:500])
        drop = [0, 7, 499, 7]  # dup is fine
        assert idx.remove_ids(drop) == 3
        assert idx.ntotal == 497
        fresh = PQIndex(pq, keep_corpus=True)
        fresh.add(self._kept(corpus[:500], drop))
        a = idx.search(corpus[:6], k=5, rerank=20)
        b = fresh.search(corpus[:6], k=5, rerank=20)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    def test_sq_index(self, corpus):
        idx = SQIndex.from_data(corpus[:400])
        assert idx.remove_ids([1, 2, 3]) == 3
        fresh = SQIndex(idx.sq)
        fresh.add(self._kept(corpus[:400], [1, 2, 3]))
        a, _ = idx.search(corpus[:6], k=5)
        b, _ = fresh.search(corpus[:6], k=5)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rq_index(self, corpus):
        from vq_tpu.models.rq import ResidualQuantizer
        from vq_tpu.search import RQIndex

        rq = ResidualQuantizer(corpus[:400], 3, 16, max_iters=5)
        idx = RQIndex(rq)
        idx.add(corpus[:400])
        assert idx.remove_ids(np.arange(100)) == 100
        fresh = RQIndex(rq)
        fresh.add(corpus[100:400])
        a, _ = idx.search(corpus[:6], k=5)
        b, _ = fresh.search(corpus[:6], k=5)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_binary_index(self, corpus):
        idx = BinaryIndex(32, threshold=0.5)
        idx.add(corpus[:300])
        assert idx.remove_ids([5]) == 1
        fresh = BinaryIndex(32, threshold=0.5)
        fresh.add(self._kept(corpus[:300], [5]))
        a, _ = idx.search(corpus[:4], k=6)
        b, _ = fresh.search(corpus[:4], k=6)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ivf_variants(self, corpus):
        from vq_tpu import IVFFlatIndex, IVFSQIndex

        drop = np.arange(0, 600, 7)
        for cls, kw in ((IVFFlatIndex, {}), (IVFSQIndex, {})):
            idx = cls.train(corpus[:600], nlist=8, seed=2, **kw)
            idx.add(corpus[:600])
            assert idx.remove_ids(drop) == len(drop)
            fresh = (
                cls(idx.coarse, store_dtype=idx.store_dtype)
                if cls is IVFFlatIndex
                else cls(idx.coarse, idx.sq)
            )
            fresh.add(self._kept(corpus[:600], drop))
            a, _ = idx.search(corpus[:5], k=4, nprobe=8)
            b, _ = fresh.search(corpus[:5], k=4, nprobe=8)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ivfpq(self, corpus):
        from vq_tpu import IVFPQIndex

        idx = IVFPQIndex.train(corpus[:600], nlist=8, num_subspaces=4,
                               num_centroids=16, seed=2)
        idx.add(corpus[:600])
        drop = [10, 20, 30]
        assert idx.remove_ids(drop) == 3
        fresh = IVFPQIndex(idx.coarse, idx.pq, by_residual=idx.by_residual)
        fresh.add(self._kept(corpus[:600], drop))
        a, _ = idx.search(corpus[:5], k=4, nprobe=8)
        b, _ = fresh.search(corpus[:5], k=4, nprobe=8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_errors(self, corpus, pq):
        idx = PQIndex(pq)
        with pytest.raises(EmptyInput):
            idx.remove_ids([0])
        idx.add(corpus[:10])
        with pytest.raises(InvalidParameter):
            idx.remove_ids([10])
        with pytest.raises(InvalidParameter):
            idx.remove_ids([-1])


class TestFlatIndex:
    def test_exact_top1(self, corpus):
        from vq_tpu.search import FlatIndex

        idx = FlatIndex.from_data(corpus)
        queries = corpus[50:60] + 1e-4
        ids, dist = idx.search(queries, k=3)
        np.testing.assert_array_equal(
            np.asarray(ids)[:, 0], exact_top1(np.asarray(queries), corpus)
        )
        assert (np.diff(np.asarray(dist), axis=1) >= -1e-6).all()

    def test_matches_numpy_distances(self, corpus):
        from vq_tpu.search import FlatIndex

        queries = corpus[:4] * 1.3 + 0.05
        for metric in ("squared_euclidean", "euclidean", "manhattan"):
            idx = FlatIndex.from_data(corpus[:500], metric=metric)
            ids, dist = idx.search(queries, k=5, chunk=128)
            diff = corpus[None, :500, :] - np.asarray(queries)[:, None, :]
            if metric == "manhattan":
                ref = np.abs(diff).sum(-1)
            else:
                ref = (diff**2).sum(-1)
                if metric == "euclidean":
                    ref = np.sqrt(ref)
            order = np.argsort(ref, axis=1, kind="stable")[:, :5]
            np.testing.assert_array_equal(np.asarray(ids), order)
            np.testing.assert_allclose(
                np.asarray(dist),
                np.take_along_axis(ref, order, axis=1),
                rtol=2e-4, atol=2e-4,
            )

    def test_dot_descending_scores(self, corpus):
        from vq_tpu.search import FlatIndex

        idx = FlatIndex.from_data(corpus[:800], metric="dot")
        q = corpus[:6]
        ids, scores = idx.search(q, k=4)
        ref = np.asarray(q) @ corpus[:800].T
        np.testing.assert_array_equal(
            np.asarray(ids)[:, 0], np.argmax(ref, axis=1)
        )
        assert (np.diff(np.asarray(scores), axis=1) <= 1e-5).all()

    def test_bf16_storage_close_to_f32(self, corpus):
        from vq_tpu.search import FlatIndex

        f32 = FlatIndex.from_data(corpus[:1000])
        bf16 = FlatIndex.from_data(corpus[:1000], storage="bfloat16")
        assert bf16.code_bytes_per_vector == corpus.shape[1] * 2
        q = corpus[200:208]
        ids32, _ = f32.search(q, k=1)
        ids16, _ = bf16.search(q, k=1)
        # self-queries: the nearest row survives bf16 rounding
        np.testing.assert_array_equal(np.asarray(ids32), np.asarray(ids16))

    def test_range_search_counts_and_hits(self, corpus):
        from vq_tpu.search import FlatIndex

        sub = corpus[:400]
        idx = FlatIndex.from_data(sub)
        q = sub[:3]
        radius = 2.0
        ids, vals, counts = idx.range_search(q, radius, max_results=500)
        ref = ((sub[None, :, :] - np.asarray(q)[:, None, :]) ** 2).sum(-1)
        ref_counts = (ref <= radius).sum(axis=1)
        np.testing.assert_array_equal(np.asarray(counts), ref_counts)
        ids_np, vals_np = np.asarray(ids), np.asarray(vals)
        for row, (i_row, v_row, c) in enumerate(
            zip(ids_np, vals_np, ref_counts)
        ):
            got = i_row[i_row >= 0]
            assert len(got) == c
            expected = set(np.nonzero(ref[row] <= radius)[0].tolist())
            assert set(got.tolist()) == expected
            assert (v_row[i_row >= 0] <= radius + 1e-5).all()

    def test_range_search_cap_reports_true_count(self, corpus):
        from vq_tpu.search import FlatIndex

        idx = FlatIndex.from_data(corpus[:400])
        q = corpus[:2]
        # huge radius: everything is a hit, cap at 16
        ids, vals, counts = idx.range_search(q, 1e9, max_results=16)
        assert np.asarray(counts).tolist() == [400, 400]
        assert np.asarray(ids).shape == (2, 16)
        assert (np.asarray(ids) >= 0).all()

    def test_range_search_dot_semantics(self, corpus):
        from vq_tpu.search import FlatIndex

        sub = corpus[:300]
        idx = FlatIndex.from_data(sub, metric="dot")
        q = corpus[:2]
        radius = 9.0  # score >= 9 is a hit
        ids, scores, counts = idx.range_search(q, radius, max_results=400)
        ref = np.asarray(q) @ sub.T
        np.testing.assert_array_equal(
            np.asarray(counts), (ref >= radius).sum(axis=1)
        )
        hits = np.asarray(ids) >= 0
        assert (np.asarray(scores)[hits] >= radius - 1e-5).all()

    def test_save_load_roundtrip(self, corpus, tmp_path):
        from vq_tpu.search import FlatIndex

        for storage in ("float32", "bfloat16", "float16"):
            idx = FlatIndex.from_data(
                corpus[:256], metric="cosine", storage=storage
            )
            p = idx.save(str(tmp_path / f"flat_{storage}.npz"))
            idx2 = FlatIndex.load(p)
            assert idx2.ntotal == 256
            assert idx2.metric == "cosine"
            assert idx2.storage == storage
            ids1, d1 = idx.search(corpus[:5], k=3)
            ids2, d2 = idx2.search(corpus[:5], k=3)
            np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
            np.testing.assert_allclose(
                np.asarray(d1), np.asarray(d2), atol=1e-6
            )

    def test_remove_ids_renumbers(self, corpus):
        from vq_tpu.search import FlatIndex

        idx = FlatIndex.from_data(corpus[:100])
        assert idx.remove_ids([0, 5]) == 2
        assert idx.ntotal == 98
        ids, _ = idx.search(corpus[1:2], k=1)
        assert int(np.asarray(ids)[0, 0]) == 0  # old row 1 renumbered

    def test_reconstruct_exact(self, corpus):
        from vq_tpu.search import FlatIndex

        idx = FlatIndex.from_data(corpus[:64])
        np.testing.assert_array_equal(
            np.asarray(idx.reconstruct([3, 7])), corpus[[3, 7]]
        )

    def test_validation(self, corpus):
        from vq_tpu.search import FlatIndex

        with pytest.raises(InvalidParameter):
            FlatIndex(8, metric="nope")
        with pytest.raises(InvalidParameter):
            FlatIndex(8, storage="f64")
        idx = FlatIndex(8)
        with pytest.raises(EmptyInput):
            idx.search(np.zeros((1, 8), np.float32))
        with pytest.raises(EmptyInput):
            idx.range_search(np.zeros((1, 8), np.float32), 1.0)
        idx.add(np.zeros((4, 8), np.float32))
        with pytest.raises(DimensionMismatch):
            idx.search(np.zeros((1, 9), np.float32))
        with pytest.raises(InvalidParameter):
            idx.range_search(np.zeros((1, 8), np.float32), 1.0, max_results=0)


class TestQuantizedRangeSearch:
    """range_search parity on SQIndex / RQIndex / PQIndex: counts and hit
    sets must match a dense computation of the same asymmetric values."""

    def test_sq_range_matches_decoded_distances(self, corpus):
        from vq_tpu.models.sq import PerDimScalarQuantizer
        from vq_tpu.search import SQIndex

        sub = corpus[:500]
        idx = SQIndex(PerDimScalarQuantizer.from_data(sub, 256))
        idx.add(sub)
        q = sub[:3] + 0.01
        decoded = np.asarray(idx.sq.dequantize(idx.sq.quantize(sub)))
        ref = ((decoded[None, :, :] - q[:, None, :]) ** 2).sum(-1)
        radius = float(np.quantile(ref, 0.05))
        ids, vals, counts = idx.range_search(q, radius, max_results=600)
        np.testing.assert_array_equal(
            np.asarray(counts), (ref <= radius + 1e-6).sum(1)
        )
        ids_np = np.asarray(ids)
        for row in range(3):
            got = set(ids_np[row][ids_np[row] >= 0].tolist())
            expect = set(np.nonzero(ref[row] <= radius - 1e-6)[0].tolist())
            assert expect <= got  # modulo f32 boundary ties

    def test_sq_range_dot(self, corpus):
        from vq_tpu.search import SQIndex

        sub = corpus[:400]
        idx = SQIndex.from_data(sub, metric="dot")
        q = sub[:2]
        decoded = np.asarray(idx.sq.dequantize(idx.sq.quantize(sub)))
        ref = q @ decoded.T
        radius = float(np.quantile(ref, 0.9))
        ids, scores, counts = idx.range_search(q, radius, max_results=500)
        np.testing.assert_array_equal(
            np.asarray(counts), (ref >= radius - 1e-6).sum(1)
        )
        hits = np.asarray(ids) >= 0
        assert (np.asarray(scores)[hits] >= radius - 1e-4).all()

    def test_rq_range_counts(self, corpus, rng):
        from vq_tpu.models.rq import ResidualQuantizer, rq_train
        from vq_tpu.search import RQIndex

        sub = corpus[:400]
        rq = ResidualQuantizer(codebooks=rq_train(sub, 2, 16, max_iters=4))
        idx = RQIndex(rq)
        idx.add(sub)
        q = sub[:3]
        decoded = np.asarray(rq.decode(rq.encode(sub)))
        ref = ((decoded[None, :, :] - q[:, None, :]) ** 2).sum(-1)
        radius = float(np.quantile(ref, 0.1))
        ids, vals, counts = idx.range_search(q, radius, max_results=500)
        got = np.asarray(counts)
        # The device assembles d as qn² − 2q·y + ‖y‖² (catastrophic
        # cancellation, ~1e-3 absolute noise), so rows AT the radius can
        # flip either way — bound the count by the radius ± noise band
        # instead of a fixed miscount budget (which is draw-sensitive:
        # the session rng stream shifts under targeted subset runs).
        atol = 1e-3 + 1e-4 * radius
        lo = (ref <= radius - atol).sum(1)
        hi = (ref <= radius + atol).sum(1)
        assert ((got >= lo) & (got <= hi)).all(), (got, lo, hi)

    def test_pq_range_matches_adc(self, corpus, pq):
        from vq_tpu.search import PQIndex

        idx = PQIndex(pq)
        idx.add(corpus[:800])
        q = corpus[:3]
        adc = np.asarray(pq.adc_distances(q, idx._codes))
        radius = float(np.quantile(adc, 0.05))
        ids, vals, counts = idx.range_search(q, radius, max_results=900)
        np.testing.assert_array_equal(
            np.asarray(counts), (adc <= radius + 1e-6).sum(1)
        )
        ids_np, vals_np = np.asarray(ids), np.asarray(vals)
        assert (vals_np[ids_np >= 0] <= radius + 1e-5).all()

    def test_pq_range_packed_codes(self, corpus):
        from vq_tpu import ProductQuantizer
        from vq_tpu.search import PQIndex

        pq16 = ProductQuantizer(corpus, 4, 16, max_iters=4)
        idx = PQIndex(pq16)  # auto-packs at k<=16
        idx.add(corpus[:300])
        assert idx.pack_bits == 4
        q = corpus[:2]
        from vq_tpu.ops.packing import unpack_codes

        codes = unpack_codes(idx._codes, 4, 4)
        adc = np.asarray(pq16.adc_distances(q, codes))
        radius = float(np.quantile(adc, 0.2))
        _, _, counts = idx.range_search(q, radius, max_results=300)
        np.testing.assert_array_equal(
            np.asarray(counts), (adc <= radius + 1e-6).sum(1)
        )

"""merge_from + search_and_reconstruct across the index zoo (faiss
``merge_from`` / ``search_and_reconstruct`` analogs)."""

import numpy as np
import pytest

import vq_tpu
from vq_tpu import (
    BinaryIndex,
    FlatIndex,
    GraphIndex,
    IVFBinaryIndex,
    IVFFlatIndex,
    IVFPQIndex,
    IVFRQIndex,
    IVFSQIndex,
    IdMapIndex,
    PQIndex,
    PerDimScalarQuantizer,
    ProductQuantizer,
    RQIndex,
    ResidualQuantizer,
    SQIndex,
    index_factory,
)
from vq_tpu.errors import InvalidData, InvalidParameter


def _data(n=240, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)).astype(np.float32)


def _search_equal(a, b, q, k=5, **kw):
    ia, va = a.search(q, k, **kw)
    ib, vb = b.search(q, k, **kw)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-4)


class TestFlatMerge:
    def test_merge_equals_single_index(self):
        x = _data()
        a = FlatIndex.from_data(x[:100])
        b = FlatIndex.from_data(x[100:])
        whole = FlatIndex.from_data(x)
        moved = a.merge_from(b)
        assert moved == 140
        assert a.ntotal == 240 and b.ntotal == 0
        _search_equal(a, whole, x[:7])

    def test_type_mismatch(self):
        a = FlatIndex.from_data(_data())
        with pytest.raises(InvalidParameter):
            a.merge_from(SQIndex.from_data(_data()))

    def test_param_mismatch(self):
        a = FlatIndex.from_data(_data())
        b = FlatIndex.from_data(_data(seed=1), storage="bfloat16")
        with pytest.raises(InvalidData):
            a.merge_from(b)

    def test_search_and_reconstruct_exact(self):
        x = _data()
        idx = FlatIndex.from_data(x)
        ids, vals, rec = idx.search_and_reconstruct(x[:5], k=3)
        assert rec.shape == (5, 3, 16)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(x)[np.asarray(ids)], atol=1e-6
        )
        # top-1 of a corpus point is itself
        np.testing.assert_allclose(np.asarray(rec)[:, 0, :], x[:5], atol=1e-6)


class TestCodedMerges:
    def test_pq(self):
        x = _data(seed=2)
        pq = ProductQuantizer(x, 4, 16, max_iters=4, seed=1)
        a, b, whole = PQIndex(pq), PQIndex(pq), PQIndex(pq)
        a.add(x[:100]); b.add(x[100:]); whole.add(x)
        assert a.merge_from(b) == 140
        assert b.ntotal == 0
        _search_equal(a, whole, x[:6])

    def test_pq_codebook_mismatch(self):
        x = _data(seed=2)
        a = PQIndex(ProductQuantizer(x, 4, 16, max_iters=4, seed=1))
        b = PQIndex(ProductQuantizer(x, 4, 16, max_iters=4, seed=9))
        a.add(x); b.add(x)
        with pytest.raises(InvalidData):
            a.merge_from(b)

    def test_pq_corpus_required(self):
        x = _data(seed=2)
        pq = ProductQuantizer(x, 4, 16, max_iters=4, seed=1)
        a = PQIndex(pq, keep_corpus=True)
        b = PQIndex(pq)
        a.add(x[:50]); b.add(x[50:])
        with pytest.raises(InvalidData):
            a.merge_from(b)

    def test_pq_reconstruct_matches_decode(self):
        x = _data(seed=3)
        pq = ProductQuantizer(x, 4, 16, max_iters=4, seed=1)
        idx = PQIndex(pq)
        idx.add(x)
        ids, _, rec = idx.search_and_reconstruct(x[:4], k=2)
        expect = pq.decode(pq.encode(x))[np.asarray(ids).ravel()]
        np.testing.assert_allclose(
            np.asarray(rec).reshape(-1, 16), np.asarray(expect), atol=1e-5
        )

    def test_sq(self):
        x = _data(seed=4)
        sq = PerDimScalarQuantizer.from_data(x, 256)
        a, b, whole = SQIndex(sq), SQIndex(sq), SQIndex(sq)
        a.add(x[:100]); b.add(x[100:]); whole.add(x)
        assert a.merge_from(b) == 140
        _search_equal(a, whole, x[:6])
        ids, _, rec = a.search_and_reconstruct(x[:3], k=2)
        np.testing.assert_allclose(
            np.asarray(rec).reshape(-1, 16),
            np.asarray(sq.dequantize(sq.quantize(x)))[np.asarray(ids).ravel()],
            atol=1e-5,
        )

    def test_sq_range_mismatch(self):
        a = SQIndex.from_data(_data(seed=4))
        b = SQIndex.from_data(_data(seed=5) * 3.0)
        with pytest.raises(InvalidData):
            a.merge_from(b)

    def test_rq(self):
        x = _data(seed=6)
        rq = ResidualQuantizer(x, 2, 16, max_iters=4, seed=1)
        a, b, whole = RQIndex(rq), RQIndex(rq), RQIndex(rq)
        a.add(x[:100]); b.add(x[100:]); whole.add(x)
        assert a.merge_from(b) == 140
        _search_equal(a, whole, x[:6])

    def test_binary(self):
        x = _data(seed=7, d=32)
        a = BinaryIndex(32); b = BinaryIndex(32); whole = BinaryIndex(32)
        a.add(x[:100]); b.add(x[100:]); whole.add(x)
        assert a.merge_from(b) == 140
        _search_equal(a, whole, x[:6])

    def test_binary_threshold_mismatch(self):
        a = BinaryIndex(32)
        b = BinaryIndex(32, threshold=0.5)
        a.add(_data(d=32)); b.add(_data(d=32))
        with pytest.raises(InvalidData):
            a.merge_from(b)


class TestIVFMerges:
    def _pair(self, cls_train, x, **kw):
        a = cls_train(x, 4, max_iters=4, seed=3, **kw)
        b = cls_train(x, 4, max_iters=4, seed=3, **kw)
        whole = cls_train(x, 4, max_iters=4, seed=3, **kw)
        a.add(x[:100]); b.add(x[100:]); whole.add(x)
        return a, b, whole

    def test_ivf_flat(self):
        x = _data(seed=8)
        a, b, whole = self._pair(IVFFlatIndex.train, x)
        assert a.merge_from(b) == 140
        assert b.ntotal == 0
        _search_equal(a, whole, x[:6], nprobe=4)
        ids, _, rec = a.search_and_reconstruct(x[:3], k=2, nprobe=4)
        np.testing.assert_allclose(
            np.asarray(rec).reshape(-1, 16),
            x[np.asarray(ids).ravel()], atol=1e-5,
        )

    def test_ivf_flat_coarse_mismatch(self):
        x = _data(seed=8)
        a = IVFFlatIndex.train(x, 4, max_iters=4, seed=3)
        b = IVFFlatIndex.train(x, 4, max_iters=4, seed=4)
        a.add(x); b.add(x)
        with pytest.raises(InvalidData):
            a.merge_from(b)

    def test_ivf_sq(self):
        x = _data(seed=9)
        a, b, whole = self._pair(IVFSQIndex.train, x)
        assert a.merge_from(b) == 140
        _search_equal(a, whole, x[:6], nprobe=4)

    def test_ivf_rq(self):
        x = _data(seed=10)
        a, b, whole = self._pair(
            IVFRQIndex.train, x, num_stages=2, num_centroids=16
        )
        assert a.merge_from(b) == 140
        _search_equal(a, whole, x[:6], nprobe=4)

    def test_ivf_pq(self):
        x = _data(seed=11)
        a, b, whole = self._pair(
            IVFPQIndex.train, x, num_subspaces=4, num_centroids=16
        )
        assert a.merge_from(b) == 140
        _search_equal(a, whole, x[:6], nprobe=4)
        # reconstruct: coarse + decoded residual
        rec = a.reconstruct(np.arange(5))
        err = np.mean((np.asarray(rec) - x[:5]) ** 2)
        assert err < np.mean(x[:5] ** 2)  # better than the zero vector

    def test_ivf_binary(self):
        x = _data(seed=12, d=32)
        a = IVFBinaryIndex.train(x, 4, max_iters=4, seed=3)
        b = IVFBinaryIndex.train(x, 4, max_iters=4, seed=3)
        whole = IVFBinaryIndex.train(x, 4, max_iters=4, seed=3)
        a.add(x[:100]); b.add(x[100:]); whole.add(x)
        assert a.merge_from(b) == 140
        _search_equal(a, whole, x[:6], nprobe=4)


class TestWrapperMerges:
    def test_idmap(self):
        x = _data(seed=13)
        a = IdMapIndex(FlatIndex(16))
        b = IdMapIndex(FlatIndex(16))
        a.add_with_ids(x[:100], np.arange(1000, 1100))
        b.add_with_ids(x[100:], np.arange(5000, 5140))
        assert a.merge_from(b) == 140
        assert b.ntotal == 0
        ids, _ = a.search(x[100:103], k=1)
        np.testing.assert_array_equal(
            np.asarray(ids)[:, 0], [5000, 5001, 5002]
        )
        ids, _, rec = a.search_and_reconstruct(x[:2], k=1)
        np.testing.assert_allclose(
            np.asarray(rec)[:, 0, :], x[:2], atol=1e-6
        )

    def test_idmap_duplicate_ids(self):
        x = _data(seed=13)
        a = IdMapIndex(FlatIndex(16))
        b = IdMapIndex(FlatIndex(16))
        a.add_with_ids(x[:10], np.arange(10))
        b.add_with_ids(x[10:20], np.arange(5, 15))
        with pytest.raises(InvalidData):
            a.merge_from(b)

    def test_factory_shell(self):
        x = _data(seed=14)
        a = index_factory(16, "PCA8,Flat")
        b = index_factory(16, "PCA8,Flat")
        a.train(x, seed=1)
        # identical fitted transforms: clone via save/load of the built
        import tempfile, os

        with tempfile.TemporaryDirectory() as td:
            p = a.index.save(os.path.join(td, "idx"))
            from vq_tpu import load_index

            b_built = load_index(p)
        b._built = b_built
        a.add(x[:100])
        b.add(x[100:])
        assert a.merge_from(b) == 140
        assert a.ntotal == 240
        ids, vals, rec = a.search_and_reconstruct(x[:3], k=2)
        assert rec.shape == (3, 2, 16)

    def test_transformed_mismatch(self):
        x = _data(seed=15)
        a = index_factory(16, "PCA8,Flat")
        b = index_factory(16, "PCA8,Flat")
        a.train(x, seed=1)
        b.train(x * 2.0 + 1.0, seed=2)
        a.add(x[:10]); b.add(x[10:20])
        with pytest.raises(InvalidData):
            a.merge_from(b)

    def test_graph_refuses(self):
        x = _data(seed=16, n=300)
        g = GraphIndex.build(x, degree=8, seed=0)
        with pytest.raises(InvalidData):
            g.merge_from(g)
        ids, _, rec = g.search_and_reconstruct(x[:3], k=2)
        np.testing.assert_allclose(
            np.asarray(rec)[:, 0, :], x[:3], atol=1e-5
        )

"""Index layer: PQIndex and BinaryIndex add/search/save/load."""

import numpy as np
import pytest

from vq_tpu import ProductQuantizer
from vq_tpu.errors import DimensionMismatch, EmptyInput, InvalidData
from vq_tpu.search import BinaryIndex, PQIndex


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


def test_binary_index_rerank_without_corpus_raises():
    # Round-2 regression (VERDICT r1 #9): BinaryIndex.search silently fell
    # back to Hamming when rerank was requested without a kept corpus;
    # PQIndex raises InvalidData for the same misuse — now both do.
    rng = np.random.default_rng(11)
    idx = BinaryIndex(32)
    idx.add(rng.normal(0, 1, (100, 32)).astype(np.float32))
    with pytest.raises(InvalidData):
        idx.search(rng.normal(0, 1, (4, 32)).astype(np.float32), k=3, rerank=10)

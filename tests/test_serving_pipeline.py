"""BatchPipeline / pipelined_search: one-dispatch pipelined serving must be
bit-identical to per-batch ``search`` calls on every index type."""

import numpy as np
import pytest

import vq_tpu
from vq_tpu import (
    BatchPipeline,
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
    ProductQuantizer,
    RQIndex,
    ResidualQuantizer,
    SQIndex,
    index_factory,
    pipelined_search,
)
from vq_tpu.errors import DimensionMismatch, InvalidData, InvalidParameter

T, Q, D, K = 3, 16, 16, 5


def _data(n=400, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, D)).astype(np.float32)


def _batches(seed=1):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(T, Q, D)).astype(np.float32)


def _assert_pipeline_matches(index, batches, **params):
    pipe = BatchPipeline(index, k=K, **params)
    ids_p, vals_p = pipe.search(batches)
    assert ids_p.shape[:2] == (T, Q)
    for t in range(T):
        ids_s, vals_s = index.search(batches[t], K, **params)
        np.testing.assert_array_equal(np.asarray(ids_p[t]), np.asarray(ids_s))
        np.testing.assert_allclose(
            np.asarray(vals_p[t]), np.asarray(vals_s), atol=1e-5
        )


class TestParity:
    def test_flat(self):
        idx = FlatIndex.from_data(_data())
        _assert_pipeline_matches(idx, _batches())

    def test_flat_dot(self):
        idx = FlatIndex.from_data(_data(), metric="dot")
        _assert_pipeline_matches(idx, _batches())

    def test_pq(self):
        x = _data()
        idx = PQIndex(ProductQuantizer(x, 4, 16, max_iters=3, seed=1))
        idx.add(x)
        _assert_pipeline_matches(idx, _batches())

    def test_pq_rerank(self):
        x = _data()
        idx = PQIndex(
            ProductQuantizer(x, 4, 16, max_iters=3, seed=1),
            keep_corpus=True,
        )
        idx.add(x)
        _assert_pipeline_matches(idx, _batches(), rerank=20)

    def test_sq(self):
        idx = SQIndex.from_data(_data())
        _assert_pipeline_matches(idx, _batches())

    def test_sq_rerank(self):
        x = _data()
        idx = SQIndex.from_data(x, keep_corpus=True)
        _assert_pipeline_matches(idx, _batches(), rerank=20)

    def test_rq(self):
        x = _data()
        idx = RQIndex(ResidualQuantizer(x, 2, 16, max_iters=3, seed=1))
        idx.add(x)
        _assert_pipeline_matches(idx, _batches())

    def test_binary(self):
        idx = BinaryIndex(D)
        idx.add(_data())
        _assert_pipeline_matches(idx, _batches())

    def test_binary_rerank(self):
        idx = BinaryIndex(D, keep_corpus=True)
        idx.add(_data())
        _assert_pipeline_matches(idx, _batches(), rerank=20)

    def test_ivf_flat(self):
        x = _data()
        idx = IVFFlatIndex.train(x, 4, max_iters=3, seed=1)
        idx.add(x)
        _assert_pipeline_matches(idx, _batches(), nprobe=2)

    def test_ivf_sq(self):
        x = _data()
        idx = IVFSQIndex.train(x, 4, max_iters=3, seed=1)
        idx.add(x)
        _assert_pipeline_matches(idx, _batches(), nprobe=2)

    def test_ivf_rq(self):
        x = _data()
        idx = IVFRQIndex.train(
            x, 4, num_stages=2, num_centroids=16, max_iters=3, seed=1
        )
        idx.add(x)
        _assert_pipeline_matches(idx, _batches(), nprobe=2)

    def test_ivf_pq(self):
        x = _data()
        idx = IVFPQIndex.train(x, 4, 4, 16, max_iters=3, seed=1)
        idx.add(x)
        _assert_pipeline_matches(idx, _batches(), nprobe=2)

    def test_ivf_pq_rerank(self):
        x = _data()
        idx = IVFPQIndex.train(
            x, 4, 4, 16, max_iters=3, seed=1, keep_corpus=True
        )
        idx.add(x)
        _assert_pipeline_matches(idx, _batches(), nprobe=2, rerank=20)

    def test_ivf_binary(self):
        x = _data()
        idx = IVFBinaryIndex.train(x, 4, max_iters=3, seed=1)
        idx.add(x)
        _assert_pipeline_matches(idx, _batches(), nprobe=2)

    def test_graph(self):
        x = _data()
        idx = GraphIndex.build(x, degree=8, seed=0)
        _assert_pipeline_matches(idx, _batches(), beam=16)

    def test_factory_and_transform(self):
        x = _data()
        f = index_factory(D, "PCA8,IVF4,Flat")
        f.train(x, max_iters=3)
        f.add(x)
        _assert_pipeline_matches(f, _batches(), nprobe=2)


class TestContract:
    def test_stale_pipeline_raises(self):
        x = _data()
        idx = FlatIndex.from_data(x)
        pipe = BatchPipeline(idx, k=K)
        idx.add(x[:10])
        with pytest.raises(InvalidData):
            pipe.search(_batches())

    def test_bad_rank(self):
        idx = FlatIndex.from_data(_data())
        pipe = BatchPipeline(idx, k=K)
        with pytest.raises(InvalidParameter):
            pipe.search(np.zeros((Q, D), np.float32))

    def test_dim_mismatch(self):
        idx = FlatIndex.from_data(_data())
        pipe = BatchPipeline(idx, k=K)
        with pytest.raises(DimensionMismatch):
            pipe.search(np.zeros((T, Q, D + 1), np.float32))

    def test_unsupported_index(self):
        idx = IdMapIndex(FlatIndex.from_data(_data()))
        with pytest.raises(InvalidParameter):
            BatchPipeline(idx, k=K)

    def test_pipelined_search_flat_queries(self):
        x = _data()
        idx = FlatIndex.from_data(x)
        q = _data(n=37, seed=5)  # not a multiple of batch
        ids_p, vals_p = pipelined_search(idx, q, k=K, batch=8)
        ids_s, vals_s = idx.search(q, K)
        np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_s))
        np.testing.assert_allclose(
            np.asarray(vals_p), np.asarray(vals_s), atol=1e-5
        )

    def test_pipelined_search_reuses_pipeline(self):
        x = _data()
        idx = IVFFlatIndex.train(x, 4, max_iters=3, seed=1)
        idx.add(x)
        pipe = BatchPipeline(idx, k=K, nprobe=2)
        q = _data(n=24, seed=6)
        ids_p, _ = pipelined_search(idx, q, k=K, batch=8, pipeline=pipe)
        ids_s, _ = idx.search(q[:8], K, nprobe=2)
        np.testing.assert_array_equal(np.asarray(ids_p[:8]), np.asarray(ids_s))

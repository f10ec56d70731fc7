"""Sharded input pipeline: per-shard generation, layout independence."""

import jax
import numpy as np
import pytest

from vq_tpu.errors import InvalidParameter
from vq_tpu.parallel import (
    make_mesh,
    sharded_from_callback,
    sharded_pq_train,
    sharded_synthetic_corpus,
)


def test_callback_loads_only_local_rows():
    mesh = make_mesh()
    calls = []

    def load(start, stop):
        calls.append((start, stop))
        return np.full((stop - start, 4), float(start), dtype=np.float32)

    arr = sharded_from_callback(64, 4, load, mesh)
    assert arr.shape == (64, 4)
    # One call per shard, covering [0, 64) disjointly.
    spans = sorted(calls)
    assert spans[0][0] == 0 and spans[-1][1] == 64
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 == b0
    host = np.asarray(arr)
    assert host[0, 0] == 0.0


def test_synthetic_layout_independent():
    # Same (n, d, seed) must give the same logical corpus on different
    # mesh sizes.
    m8 = make_mesh()
    m1 = make_mesh(n_devices=1)
    a = np.asarray(sharded_synthetic_corpus(128, 8, seed=5, mesh=m8))
    b = np.asarray(sharded_synthetic_corpus(128, 8, seed=5, mesh=m1))
    np.testing.assert_array_equal(a, b)
    # And chunking must not matter either.
    c = np.asarray(
        sharded_synthetic_corpus(128, 8, seed=5, mesh=m8, chunk_rows=32)
    )
    d = np.asarray(
        sharded_synthetic_corpus(128, 8, seed=5, mesh=m8, chunk_rows=32)
    )
    np.testing.assert_array_equal(c, d)


def test_synthetic_is_sharded():
    mesh = make_mesh()
    arr = sharded_synthetic_corpus(256, 16, seed=0, mesh=mesh)
    n_data_shards = mesh.shape["data"]
    shard_rows = {s.data.shape[0] for s in arr.addressable_shards}
    assert shard_rows == {256 // n_data_shards}


def test_train_from_sharded_corpus():
    # End to end: generate sharded, train sharded — no host gather needed.
    mesh = make_mesh()
    corpus = sharded_synthetic_corpus(512, 16, seed=1, mesh=mesh)
    res = sharded_pq_train(corpus, 4, 8, max_iters=3, seed=0, mesh=mesh)
    assert res.centroids.shape == (4, 8, 4)
    assert np.isfinite(float(res.inertia))


def test_uneven_rows_rejected():
    mesh = make_mesh()
    with pytest.raises(InvalidParameter):
        sharded_synthetic_corpus(130, 8, mesh=mesh)  # 130 % 8 != 0


def test_sharded_pq_encode_matches_single(rng):
    from vq_tpu.models.pq import pq_train
    from vq_tpu.parallel.encode import sharded_pq_encode
    from vq_tpu import pq_encode

    mesh = make_mesh()
    data = rng.random((512, 32), dtype=np.float32)
    cb = pq_train(data, 4, 8, max_iters=3, seed=0)
    sharded = sharded_pq_encode(data, cb, mesh=mesh)
    single = pq_encode(data, cb, "squared_euclidean")
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))
    # output stays sharded along the data axis
    shards = {s.data.shape[0] for s in sharded.addressable_shards}
    assert shards == {512 // mesh.shape["data"]}


def test_sharded_quantize_elementwise(rng):
    from vq_tpu import ScalarQuantizer
    from vq_tpu.parallel.encode import sharded_quantize

    mesh = make_mesh()
    data = rng.random((256, 16), dtype=np.float32)
    sq = ScalarQuantizer(0.0, 1.0, 256)
    out = sharded_quantize(sq, data, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(sq.quantize(data)))

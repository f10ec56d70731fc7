"""TSVQ tests (reference: src/tsvq.rs tests + pyvq/tests/test_tsvq.py)."""

import numpy as np
import pytest

from vq_tpu import TSVQ, DimensionMismatch, EmptyInput, Metric


@pytest.fixture(scope="module")
def train_data():
    rng = np.random.default_rng(42)
    return rng.random((200, 8), dtype=np.float32)


class TestBasics:
    def test_identical_vectors(self):
        # reference: src/tsvq.rs:272-284
        vec = np.array([1.0, 2.0, 3.0, 4.0, 5.0], dtype=np.float32)
        data = np.tile(vec, (10, 1))
        t = TSVQ(data, 3, "squared_euclidean")
        q = np.asarray(t.quantize(vec)).astype(np.float32)
        np.testing.assert_allclose(q, vec, atol=1e-2)

    def test_quantize_shape_and_dtype(self, train_data):
        t = TSVQ(train_data, 3)
        q = np.asarray(t.quantize(train_data[0]))
        assert q.shape == (8,)
        assert q.dtype == np.float16

    def test_batch_quantize(self, train_data):
        t = TSVQ(train_data, 4)
        q = np.asarray(t.quantize(train_data[:20]))
        assert q.shape == (20, 8)

    def test_leaf_centroids_are_tree_nodes(self, train_data):
        t = TSVQ(train_data, 4)
        nodes = np.asarray(t.encode(train_data[:50]))
        cents = np.asarray(t.tree.centroids)
        left = np.asarray(t.tree.left)
        right = np.asarray(t.tree.right)
        # encoded nodes must be leaves
        for nd in nodes:
            assert left[nd] == -1 and right[nd] == -1

    def test_deeper_tree_lower_mse(self, train_data):
        def mse(depth):
            t = TSVQ(train_data, depth)
            rec = np.asarray(t.quantize(train_data)).astype(np.float32)
            return float(((rec - train_data) ** 2).mean())

        assert mse(6) < mse(1)

    def test_depth_zero_single_leaf(self, train_data):
        t = TSVQ(train_data, 0)
        assert t.num_nodes == 1
        q = np.asarray(t.quantize(train_data[:5])).astype(np.float32)
        mean = train_data.mean(0)
        np.testing.assert_allclose(q, np.tile(mean, (5, 1)), atol=1e-2)

    def test_dequantize_roundtrip(self, train_data):
        t = TSVQ(train_data, 3)
        q = t.quantize(train_data[:4])
        rec = np.asarray(t.dequantize(q))
        assert rec.dtype == np.float32
        assert rec.shape == (4, 8)

    @pytest.mark.parametrize("metric", list(Metric))
    def test_all_metrics(self, train_data, metric):
        t = TSVQ(train_data, 3, metric)
        assert t.distance_metric == metric.value
        q = np.asarray(t.quantize(train_data[:5]))
        assert q.shape == (5, 8)

    def test_getters_and_repr(self, train_data):
        t = TSVQ(train_data, 5)
        assert t.dim == 8
        assert t.max_depth == 5
        assert t.num_nodes >= t.num_leaves >= 1
        assert "TSVQ" in repr(t)

    def test_determinism(self, train_data):
        a = np.asarray(TSVQ(train_data, 4).quantize(train_data[:10]))
        b = np.asarray(TSVQ(train_data, 4).quantize(train_data[:10]))
        np.testing.assert_array_equal(a, b)

    def test_nan_rows_go_right(self):
        # NaN comparisons are false -> NaN rows partition right
        # (reference src/tsvq.rs:83-85); must not crash
        data = np.ones((20, 4), dtype=np.float32)
        data[:, 0] = np.arange(20)
        data[3, 0] = np.nan
        t = TSVQ(data, 3)
        q = np.asarray(t.quantize(data[:2]))
        assert q.shape == (2, 4)

    def test_prebuilt_tree(self, train_data):
        t1 = TSVQ(train_data, 4)
        t2 = TSVQ(tree=t1.tree)
        np.testing.assert_array_equal(
            np.asarray(t1.encode(train_data[:10])),
            np.asarray(t2.encode(train_data[:10])),
        )


class TestValidation:
    def test_empty_training(self):
        # reference: src/tsvq.rs:302-306
        with pytest.raises(EmptyInput):
            TSVQ(np.zeros((0, 4), dtype=np.float32), 3)

    def test_quantize_wrong_dim(self, train_data):
        # reference: src/tsvq.rs:240-245
        t = TSVQ(train_data, 3)
        with pytest.raises(DimensionMismatch):
            t.quantize(np.ones(5, dtype=np.float32))

    def test_dequantize_wrong_dim(self, train_data):
        t = TSVQ(train_data, 3)
        with pytest.raises(DimensionMismatch):
            t.dequantize(np.ones(5, dtype=np.float16))

    def test_ragged_rejected(self):
        with pytest.raises(DimensionMismatch):
            TSVQ([[1.0, 2.0], [1.0]], 2)


class TestBatchedBuild:
    """Device (level-synchronous) build must produce the recursive
    builder's exact tree — same DFS numbering, topology, centroids."""

    def test_exact_tree_parity(self, rng):
        from vq_tpu.models.tsvq import tsvq_build, tsvq_build_batched

        data = rng.random((2000, 16), dtype=np.float32)
        a = tsvq_build(data, 5)
        b = tsvq_build_batched(data, 5)
        assert a.num_nodes == b.num_nodes
        np.testing.assert_array_equal(np.asarray(a.left), np.asarray(b.left))
        np.testing.assert_array_equal(np.asarray(a.right), np.asarray(b.right))
        np.testing.assert_allclose(
            np.asarray(a.centroids), np.asarray(b.centroids),
            rtol=1e-6, atol=1e-6,
        )

    def test_nan_rows(self, rng):
        from vq_tpu.models.tsvq import tsvq_build, tsvq_build_batched

        data = rng.random((300, 8), dtype=np.float32)
        data[7, 2] = np.nan
        data[100, 5] = np.nan
        a = tsvq_build(data, 4)
        b = tsvq_build_batched(data, 4)
        assert a.num_nodes == b.num_nodes
        np.testing.assert_array_equal(np.asarray(a.left), np.asarray(b.left))

    def test_via_class(self, rng):
        data = rng.random((500, 8), dtype=np.float32)
        host = TSVQ(data, max_depth=4, build="host")
        dev = TSVQ(data, max_depth=4, build="device")
        np.testing.assert_array_equal(
            np.asarray(host.encode(data[:50])),
            np.asarray(dev.encode(data[:50])),
        )

    def test_depth_zero_and_tiny(self, rng):
        from vq_tpu.models.tsvq import tsvq_build, tsvq_build_batched

        data = rng.random((5, 4), dtype=np.float32)
        a = tsvq_build(data, 0)
        b = tsvq_build_batched(data, 0)
        assert a.num_nodes == b.num_nodes == 1
        one = rng.random((1, 4), dtype=np.float32)
        assert tsvq_build_batched(one, 3).num_nodes == 1


def test_traverse_scores_path_matches_gather_path(rng):
    """The L2 scores-matmul traversal must pick the same leaves as the
    per-level gather form (near-ties are measure-zero on random floats;
    the descent rule is identical)."""
    import jax.numpy as jnp

    from vq_tpu.models.tsvq import TSVQ, _tsvq_find_leaf

    data = rng.random((800, 24), dtype=np.float32)
    t = TSVQ(data, max_depth=5).tree
    x = jnp.asarray(rng.random((333, 24), dtype=np.float32))
    from vq_tpu.ops.distance import Metric

    fast = _tsvq_find_leaf(
        x, t.centroids, t.left, t.right, Metric.SQUARED_EUCLIDEAN, t.depth,
        force_scores=True,
    )
    # Force the gather path by lying about the metric? No — monkeypatch
    # the node-count gate instead: call with a manhattan metric for the
    # reference (different metric -> different leaves), so compare
    # against a hand-rolled numpy descent under the same L2 rule.
    cents = np.asarray(t.centroids)
    left, right = np.asarray(t.left), np.asarray(t.right)
    nodes = np.zeros(x.shape[0], np.int32)
    xs = np.asarray(x)
    for _ in range(t.depth):
        l, r = left[nodes], right[nodes]
        cc = (cents ** 2).sum(-1)
        xc = xs @ cents.T
        sc = cc[None, :] - 2.0 * xc
        dl = sc[np.arange(len(xs)), np.maximum(l, 0)]
        dr = sc[np.arange(len(xs)), np.maximum(r, 0)]
        both = (l >= 0) & (r >= 0)
        pick_two = np.where(dl <= dr, l, r)
        pick_one = np.where(l >= 0, l, np.where(r >= 0, r, nodes))
        nodes = np.where(both, pick_two, pick_one).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(fast), nodes)


def test_level_sliced_traversal_matches_shallow_paths(rng):
    """Deep trees (>128 nodes) route through the BFS level-sliced
    traversal; its leaves must match the per-level gather form exactly
    on random data."""
    import jax.numpy as jnp

    from vq_tpu.models.tsvq import TSVQ, _find_leaves, _tsvq_find_leaf
    from vq_tpu.ops.distance import Metric

    data = rng.random((4000, 16), dtype=np.float32)
    t = TSVQ(data, max_depth=9).tree  # up to 1023 nodes
    assert t.num_nodes > 128  # really exercises the level-sliced path
    x = jnp.asarray(rng.random((777, 16), dtype=np.float32))
    got = _find_leaves(t, x, Metric.SQUARED_EUCLIDEAN, force_levels=True)
    want = _tsvq_find_leaf(
        x, t.centroids, t.left, t.right, Metric.SQUARED_EUCLIDEAN, t.depth
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # BFS layout invariants: perm is a permutation, levels partition it.
    cb, lb, rb, perm, starts = t.bfs_layout()
    assert sorted(np.asarray(perm).tolist()) == list(range(t.num_nodes))
    assert starts[0] == 0 and starts[-1] == t.num_nodes


def test_decode_pick_rows_matches_take(rng):
    import jax.numpy as jnp

    from vq_tpu.models.tsvq import TSVQ

    data = rng.random((600, 12), dtype=np.float32)
    t = TSVQ(data, max_depth=5)
    nodes = jnp.asarray(
        np.random.default_rng(4).integers(0, t.num_nodes, 500), jnp.int32
    )
    a = np.asarray(jnp.take(t.tree.centroids, nodes, axis=0))
    b = np.asarray(t.decode(nodes))
    np.testing.assert_array_equal(a, b)


def test_wide_level_traversal_matches_gather_form(rng):
    """Regression for the round-4 4096-node ceiling: trees past it keep
    the levels path, whose wide levels (width >= _TSVQ_WIDE_LEVEL_W)
    switch from full-slice scoring to per-row child gathers — leaves
    must still match the per-level gather form exactly."""
    import jax.numpy as jnp

    from vq_tpu.models.tsvq import (
        TSVQ,
        _TSVQ_WIDE_LEVEL_W,
        _find_leaves,
        _tsvq_find_leaf,
    )
    from vq_tpu.ops.distance import Metric

    # 8192 rows split on exact medians -> complete depth-12 tree
    # (8191 nodes, deepest level 4096 wide — two wide levels plus the
    # 4097-boundary crossing in one build).
    data = rng.random((8192, 8), dtype=np.float32)
    t = TSVQ(data, max_depth=12).tree
    assert t.num_nodes > 4096  # past the removed ceiling
    _, _, _, _, starts = t.bfs_layout()
    widths = [starts[i + 1] - starts[i] for i in range(len(starts) - 1)]
    assert max(widths) >= _TSVQ_WIDE_LEVEL_W  # wide branch exercised

    x = jnp.asarray(rng.random((513, 8), dtype=np.float32))
    got = _find_leaves(t, x, Metric.SQUARED_EUCLIDEAN, force_levels=True)
    want = _tsvq_find_leaf(
        x, t.centroids, t.left, t.right, Metric.SQUARED_EUCLIDEAN, t.depth
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_wide_level_traversal_uneven_tree(rng):
    """Uneven deep tree (early leaves, one-child nodes, odd widths
    crossing the wide threshold): levels leaves == gather leaves, and
    encode->decode round-trips to real tree centroids."""
    import jax.numpy as jnp

    from vq_tpu.models.tsvq import TSVQ, _find_leaves, _tsvq_find_leaf
    from vq_tpu.ops.distance import Metric

    # Duplicated rows create unsplittable nodes at varying depths.
    base = rng.random((1500, 6), dtype=np.float32)
    reps = np.repeat(base, rng.integers(1, 5, size=1500), axis=0)
    t = TSVQ(reps, max_depth=12).tree
    assert t.num_nodes > 1024

    x = jnp.asarray(rng.random((401, 6), dtype=np.float32))
    got = _find_leaves(t, x, Metric.SQUARED_EUCLIDEAN, force_levels=True)
    want = _tsvq_find_leaf(
        x, t.centroids, t.left, t.right, Metric.SQUARED_EUCLIDEAN, t.depth
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bfs_layout_first_touched_under_jit(rng):
    """Regression (round 5): a tree whose bfs_layout cache is first
    populated while TRACING a user jit must not cache tracers — staged
    jnp ops inside the trace leaked out of scope and poisoned every
    later eager call (UnexpectedTracerError in the chained deep-TSVQ
    bench)."""
    import jax
    import jax.numpy as jnp

    from vq_tpu.models.tsvq import _find_leaves, tsvq_build_batched
    from vq_tpu.ops.distance import Metric

    x = rng.random((2000, 16), dtype=np.float32)
    tree = tsvq_build_batched(jnp.asarray(x), 9)  # > 128 nodes
    assert tree._bfs_cache is None  # cache really is cold

    @jax.jit
    def enc(xb):
        return _find_leaves(tree, xb, Metric.EUCLIDEAN,
                            force_levels=True)

    inside = np.asarray(enc(jnp.asarray(x[:64])))
    # Cache must now hold concrete arrays, and eager calls must agree.
    for arr in tree._bfs_cache[:4]:
        assert not isinstance(arr, jax.core.Tracer)
    eager = np.asarray(
        _find_leaves(tree, jnp.asarray(x[:64]), Metric.EUCLIDEAN,
                     force_levels=True)
    )
    np.testing.assert_array_equal(inside, eager)

"""Autotune (ParameterSpace/OperatingPoints analog) unit tests."""

import numpy as np
import pytest

from vq_tpu import (
    FlatIndex,
    GraphIndex,
    IVFFlatIndex,
    OperatingPoint,
    PQIndex,
    ProductQuantizer,
    exact_neighbors,
    index_factory,
    pareto,
    recall_at,
    sweep,
    tune,
)
from vq_tpu.errors import InvalidParameter
from vq_tpu.tune import default_grid


def _corpus(n=800, d=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(8, d)).astype(np.float32) * 4
    lab = rng.integers(0, 8, n)
    return (centers[lab] + rng.normal(size=(n, d)).astype(np.float32)).astype(
        np.float32
    )


class TestPrimitives:
    def test_exact_neighbors_self(self):
        x = _corpus()
        ids, vals = exact_neighbors(x, x[:10], k=1)
        np.testing.assert_array_equal(ids[:, 0], np.arange(10))
        # assembled-form distances carry ~1e-4 cancellation noise at these
        # norms (see verify skill notes)
        np.testing.assert_allclose(vals[:, 0], 0.0, atol=1e-3)

    def test_recall(self):
        gt = np.array([[0, 1, 2], [3, 4, 5]])
        assert recall_at(gt, gt) == 1.0
        assert recall_at(np.array([[0, 9, 9], [9, 9, 9]]), gt) == pytest.approx(1 / 6)
        # -1 padding in results never matches; -1 in gt shrinks the denominator
        assert recall_at(np.array([[0, -1, -1]]), np.array([[0, -1, -1]])) == 1.0

    def test_recall_shape_mismatch(self):
        with pytest.raises(InvalidParameter):
            recall_at(np.zeros((2, 3)), np.zeros((3, 3)))

    def test_dominates_and_pareto(self):
        a = OperatingPoint(params={}, recall=0.9, time_ms=1.0, qps=100)
        b = OperatingPoint(params={}, recall=0.8, time_ms=2.0, qps=50)
        c = OperatingPoint(params={}, recall=0.95, time_ms=3.0, qps=30)
        assert a.dominates(b)
        assert not a.dominates(c) and not c.dominates(a)
        front = pareto([a, b, c])
        assert front == [a, c]


class TestGrids:
    def test_ivf_grid_capped_by_nlist(self):
        x = _corpus()
        idx = IVFFlatIndex.train(x, 6, max_iters=3, seed=1)
        idx.add(x)
        g = default_grid(idx)
        assert g["nprobe"][-1] == 6 and all(p <= 6 for p in g["nprobe"])

    def test_flat_grid_empty(self):
        assert default_grid(FlatIndex.from_data(_corpus())) == {}

    def test_pq_grid_needs_corpus(self):
        x = _corpus()
        pq = ProductQuantizer(x, 4, 16, max_iters=3, seed=1)
        bare = PQIndex(pq)
        bare.add(x)
        assert default_grid(bare) == {}
        kept = PQIndex(pq, keep_corpus=True)
        kept.add(x)
        assert "rerank" in default_grid(kept)

    def test_factory_delegates(self):
        x = _corpus()
        f = index_factory(16, "IVF4,Flat")
        f.train(x)
        f.add(x)
        assert "nprobe" in default_grid(f)

    def test_refine_grid_sweeps_k_factor(self):
        from vq_tpu import RefineIndex

        x = _corpus()
        pq = ProductQuantizer(x, 4, 16, max_iters=3, seed=1)
        ref = RefineIndex(PQIndex(pq), "sq8")
        ref.add(x)
        g = default_grid(ref)
        assert "k_factor" in g and "rerank" not in g


class TestSweepAndTune:
    def test_full_probe_reaches_exact(self):
        x = _corpus()
        q = _corpus(n=32, seed=9)
        gt, _ = exact_neighbors(x, q, k=5)
        idx = IVFFlatIndex.train(x, 4, max_iters=4, seed=1)
        idx.add(x)
        pts = sweep(idx, q, gt, reps=1)
        by_probe = {p.params["nprobe"]: p for p in pts}
        assert by_probe[4].recall == 1.0  # nprobe=nlist is the exact scan
        # recall is monotone in nprobe
        probes = sorted(by_probe)
        recalls = [by_probe[p].recall for p in probes]
        assert recalls == sorted(recalls)

    def test_tune_picks_cheapest_feasible(self):
        x = _corpus()
        q = _corpus(n=32, seed=9)
        gt, _ = exact_neighbors(x, q, k=5)
        idx = IVFFlatIndex.train(x, 4, max_iters=4, seed=1)
        idx.add(x)
        pts = sweep(idx, q, gt, reps=1)
        best = tune(idx, q, gt, target_recall=1.0, reps=1)
        assert best.recall == 1.0
        feasible = [p.params["nprobe"] for p in pts if p.recall == 1.0]
        assert best.params["nprobe"] <= max(feasible)

    def test_tune_unreachable_returns_best(self):
        x = _corpus()
        q = _corpus(n=16, seed=9)
        gt, _ = exact_neighbors(x, q, k=5)
        idx = IVFFlatIndex.train(x, 4, max_iters=4, seed=1)
        idx.add(x)
        best = tune(idx, q, gt, target_recall=2.0, reps=1)  # impossible
        assert best.recall <= 1.0 and "nprobe" in best.params

    def test_graph_sweep(self):
        x = _corpus(n=500)
        q = _corpus(n=16, seed=9)
        gt, _ = exact_neighbors(x, q, k=5)
        g = GraphIndex.build(x, degree=8, seed=0)
        pts = sweep(g, q, gt, grid={"beam": [4, 16]}, reps=1)
        assert len(pts) == 2
        assert pts[1].recall >= pts[0].recall - 0.05

    def test_explicit_grid_product(self):
        x = _corpus()
        q = _corpus(n=8, seed=9)
        gt, _ = exact_neighbors(x, q, k=3)
        pq = ProductQuantizer(x, 4, 16, max_iters=3, seed=1)
        idx = PQIndex(pq, keep_corpus=True)
        idx.add(x)
        pts = sweep(idx, q, gt, grid={"rerank": [0, 12, 48]}, reps=1)
        assert len(pts) == 3
        assert pts[-1].recall >= pts[0].recall

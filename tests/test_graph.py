"""GraphIndex: Vamana-style build + batched beam search.

Ground truth throughout is the exact brute-force scan; graph search is
approximate, so assertions are recall bounds (high on these sizes) plus
exact contracts for persistence, padding, and argument validation.
"""

import numpy as np
import pytest

from vq_tpu import GraphIndex
from vq_tpu.errors import (
    DimensionMismatch,
    EmptyInput,
    InvalidData,
    InvalidParameter,
)


@pytest.fixture(scope="module")
def corpus():
    # Own seeded rng: the session `rng` fixture's stream is consumed in
    # file order, so drawing from it here would shift every later
    # file's data (and their boundary-tuned assertions).
    r = np.random.default_rng(77)
    centers = r.normal(0, 3.0, (20, 32)).astype(np.float32)
    which = r.integers(0, 20, 5000)
    return (centers[which] + r.normal(0, 0.5, (5000, 32))).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def queries(corpus):
    r = np.random.default_rng(78)
    return corpus[:48] + r.normal(0, 0.01, (48, 32)).astype(np.float32)


@pytest.fixture(scope="module")
def gt(corpus, queries):
    d = np.sum((corpus[None] - queries[:, None]) ** 2, axis=-1)
    return np.argsort(d, kind="stable", axis=1)[:, :10]


@pytest.fixture(scope="module")
def idx(corpus):
    return GraphIndex.build(corpus, degree=24, alpha=1.2, seed=1)


def recall(ids, gt):
    k = gt.shape[1]
    return np.mean(
        [
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / k
            for i in range(gt.shape[0])
        ]
    )


class TestSearch:
    def test_high_recall_at_default_beam(self, idx, queries, gt):
        ids, d = idx.search(queries, k=10, beam=64)
        assert recall(np.asarray(ids), gt) >= 0.95
        # distances are exact squared-L2 to the returned rows
        ids_np, d_np = np.asarray(ids), np.asarray(d)
        r = np.asarray(idx.reconstruct(np.maximum(ids_np, 0)))
        want = np.sum((r - np.asarray(queries)[:, None]) ** 2, axis=-1)
        ok = ids_np >= 0
        # atol 1e-3: the qn² − 2qy + ||y||² assembly cancels O(100)
        # terms, so tiny distances carry ~1e-4 absolute fp noise.
        np.testing.assert_allclose(
            d_np[ok], want[ok], rtol=1e-4, atol=1e-3
        )
        assert np.isinf(d_np[~ok]).all()

    def test_beam_monotone(self, idx, queries, gt):
        r_small = recall(
            np.asarray(idx.search(queries, k=10, beam=16)[0]), gt
        )
        r_big = recall(
            np.asarray(idx.search(queries, k=10, beam=96)[0]), gt
        )
        assert r_big >= r_small - 0.02  # approximate, allow tiny noise
        assert r_big >= 0.95

    def test_single_query_vector(self, idx, corpus):
        ids, d = idx.search(corpus[7], k=3)
        assert ids.shape == (1, 3)
        assert int(np.asarray(ids)[0, 0]) == 7
        # self-distance computed as qn² − 2qy + ‖y‖² — fp noise, not 0
        assert float(np.asarray(d)[0, 0]) < 1e-3

    def test_k_larger_than_ntotal_pads(self, corpus):
        gi = GraphIndex.build(corpus[:30], degree=8)
        ids, d = gi.search(corpus[:2], k=50, beam=64)
        assert ids.shape == (2, 50)
        assert (np.asarray(ids)[:, 30:] == -1).all()
        assert np.isinf(np.asarray(d)[:, 30:]).all()

    def test_dim_mismatch(self, idx):
        with pytest.raises(DimensionMismatch):
            idx.search(np.zeros((2, 5), np.float32), k=3)


class TestBuild:
    def test_adjacency_shape_and_validity(self, idx, corpus):
        g = np.asarray(idx.graph)
        assert g.shape == (corpus.shape[0], 48)  # 2 * degree
        assert g.max() < corpus.shape[0]
        assert (g >= -1).all()
        # no self-loops in the forward half
        fwd = g[:, :24]
        rows = np.arange(corpus.shape[0])[:, None]
        assert not (fwd == rows).any()

    def test_ivf_assisted_candidates(self, corpus, queries, gt):
        gi = GraphIndex.build(
            corpus, degree=24, alpha=1.2, exact_threshold=1000, seed=2
        )
        ids, _ = gi.search(queries, k=10, beam=64)
        assert recall(np.asarray(ids), gt) >= 0.9

    def test_bf16_storage(self, corpus, queries, gt):
        gi = GraphIndex.build(corpus, degree=24, store_dtype="bfloat16")
        ids, _ = gi.search(queries, k=10, beam=64)
        assert recall(np.asarray(ids), gt) >= 0.9

    def test_bad_args(self, corpus):
        with pytest.raises(InvalidParameter):
            GraphIndex.build(np.zeros((0, 4), np.float32))
        with pytest.raises(InvalidParameter):
            GraphIndex.build(corpus[:50], degree=0)
        with pytest.raises(InvalidParameter):
            GraphIndex.build(corpus[:50], alpha=0.5)

    def test_alpha_one_is_plain_prune(self, corpus, queries, gt):
        gi = GraphIndex.build(corpus, degree=24, alpha=1.0, seed=3)
        ids, _ = gi.search(queries, k=10, beam=64)
        assert recall(np.asarray(ids), gt) >= 0.85


class TestLifecycle:
    def test_save_load_roundtrip(self, idx, queries, tmp_path):
        p = idx.save(str(tmp_path / "g.npz"))
        back = GraphIndex.load(p)
        ids0, d0 = idx.search(queries, k=5)
        ids1, d1 = back.search(queries, k=5)
        np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    def test_generic_load_index(self, idx, tmp_path):
        from vq_tpu import load_index

        p = idx.save(str(tmp_path / "g2.npz"))
        back = load_index(p)
        assert isinstance(back, GraphIndex)
        assert back.ntotal == idx.ntotal

    def test_wrong_kind_rejected(self, corpus, tmp_path):
        from vq_tpu.search import FlatIndex

        f = FlatIndex.from_data(corpus[:50])
        p = f.save(str(tmp_path / "flat.npz"))
        with pytest.raises(InvalidData):
            GraphIndex.load(p)

    def test_empty_search_raises(self):
        gi = GraphIndex(
            np.zeros((0, 4), np.float32),
            np.zeros((0, 2), np.int32),
            np.zeros((0,), np.int32),
        )
        with pytest.raises(EmptyInput):
            gi.search(np.zeros((1, 4), np.float32))


class TestReviewRegressions:
    """Round-2 review findings: tiny degrees, over-wide picks, eager
    store_dtype validation, cached sharded placements."""

    def test_degree_one_and_two_keep_contract(self, corpus):
        for deg in (1, 2):
            gi = GraphIndex.build(corpus[:300], degree=deg, seed=1)
            g = np.asarray(gi.graph)
            assert g.shape == (300, 2 * deg)
            ids, _ = gi.search(corpus[:3], k=2, beam=16)
            assert (np.asarray(ids)[:, 0] >= 0).all()

    def test_picks_wider_than_beam_clamped(self, idx, corpus):
        ids, _ = idx.search(corpus[:3], k=4, beam=8, picks_per_iter=32)
        assert np.asarray(ids).shape == (3, 4)

    def test_bad_store_dtype_rejected_before_build(self, corpus):
        with pytest.raises(InvalidParameter):
            GraphIndex.build(corpus[:100], store_dtype="f16")

    def test_sharded_replica_cache_reused(self, idx, corpus):
        from vq_tpu.parallel import sharded_graph_search
        from vq_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        sharded_graph_search(idx, corpus[:8], k=3, mesh=mesh)
        cache = idx._replica_cache
        sharded_graph_search(idx, corpus[:8], k=3, mesh=mesh)
        assert idx._replica_cache is cache  # no re-broadcast


class TestIncrementalAdd:
    """HNSW-style incremental insertion: candidates from a beam search
    over the existing graph, alpha-pruned forward edges, backlink
    re-prune only on overflow."""

    def _recall_vs_full(self, corpus, n0, batches):
        full = GraphIndex.build(corpus, degree=16, seed=3)
        inc = GraphIndex.build(corpus[:n0], degree=16, seed=3)
        for lo, hi in batches:
            inc.add(corpus[lo:hi])
        assert inc.ntotal == corpus.shape[0]
        r = np.random.default_rng(79)
        q = corpus[:32] + r.normal(0, 0.01, (32, corpus.shape[1])).astype(
            np.float32
        )
        d = np.sum((corpus[None] - q[:, None]) ** 2, axis=-1)
        g = np.argsort(d, kind="stable", axis=1)[:, :10]
        i_f, _ = full.search(q, 10, beam=48)
        i_i, _ = inc.search(q, 10, beam=48)
        return recall(np.asarray(i_f), g), recall(np.asarray(i_i), g)

    def test_matches_full_build_quality(self, corpus):
        x = corpus[:3000]
        r_full, r_inc = self._recall_vs_full(
            x, 2000, [(2000, 2500), (2500, 3000)]
        )
        assert r_inc >= r_full - 0.05

    def test_new_points_findable(self, corpus):
        gi = GraphIndex.build(corpus[:2000], degree=16, seed=4)
        new = corpus[2000:2400]
        gi.add(new)
        ids, _ = gi.search(new[:32] + 0.001, 1, beam=48)
        assert np.mean(np.asarray(ids)[:, 0] >= 2000) > 0.9

    def test_disjoint_cluster_reachable(self, corpus):
        gi = GraphIndex.build(corpus[:2000], degree=16, seed=5)
        far = (corpus[:300] * 0.05 + 40.0).astype(np.float32)
        gi.add(far)
        ids, _ = gi.search(far[:16] + 0.001, 1, beam=48)
        # routing sample folded in new ids: the far basin is reachable
        assert np.mean(np.asarray(ids)[:, 0] >= 2000) > 0.9

    def test_single_vector_and_1d(self, corpus):
        gi = GraphIndex.build(corpus[:500], degree=8, seed=6)
        gi.add(corpus[500])  # 1-D input
        assert gi.ntotal == 501
        ids, _ = gi.search(corpus[500], 1, beam=32)
        assert int(np.asarray(ids)[0, 0]) == 500

    def test_dim_mismatch(self, corpus):
        gi = GraphIndex.build(corpus[:500], degree=8, seed=7)
        with pytest.raises(DimensionMismatch):
            gi.add(corpus[:5, :-1])

    def test_save_load_roundtrips_alpha_and_adds(self, corpus, tmp_path):
        gi = GraphIndex.build(corpus[:800], degree=8, alpha=1.4, seed=8)
        gi.add(corpus[800:900])
        p = gi.save(str(tmp_path / "g"))
        ld = GraphIndex.load(p)
        assert ld.alpha == 1.4 and ld.ntotal == 900
        ld.add(corpus[900:950])  # adds keep working after reload
        assert ld.ntotal == 950

    def test_factory_hnsw_spec(self, corpus):
        from vq_tpu import index_factory
        from vq_tpu.errors import InvalidParameter

        f = index_factory(32, "HNSW16")
        f.train(corpus[:2000])  # build == train + initial add
        assert f.ntotal == 2000
        f.add(corpus[2000:2200])
        assert f.ntotal == 2200
        ids, _ = f.search(corpus[:8], 5, beam=32)
        assert np.asarray(ids).shape == (8, 5)
        with pytest.raises(InvalidParameter):
            index_factory(32, "HNSW16,RSQ8")


class TestRemoveIds:
    """faiss remove_ids contract on the graph: positional removal with
    sequential renumbering, plus delete-repair (bridge edges through the
    removed nodes' neighborhoods) so navigability survives."""

    def test_renumbers_and_repairs(self, corpus, queries):
        gi = GraphIndex.build(corpus, degree=24, seed=21)
        r = np.random.default_rng(21)
        drop = np.sort(
            r.choice(corpus.shape[0], 500, replace=False)
        )
        assert gi.remove_ids(drop) == 500
        keep = np.setdiff1d(np.arange(corpus.shape[0]), drop)
        assert gi.ntotal == keep.size
        # rows compacted in original order (sequential renumbering)
        np.testing.assert_array_equal(
            np.asarray(gi.reconstruct(np.arange(5))), corpus[keep[:5]]
        )
        # recall vs ground truth over the SURVIVING corpus
        rem = corpus[keep]
        d = np.sum((rem[None] - np.asarray(queries)[:, None]) ** 2, -1)
        g = np.argsort(d, kind="stable", axis=1)[:, :10]
        ids, _ = gi.search(queries, k=10, beam=64)
        assert np.asarray(ids).max() < keep.size
        assert recall(np.asarray(ids), g) >= 0.9

    def test_removed_top1_yields_runner_up(self, corpus):
        gi = GraphIndex.build(corpus[:1000], degree=16, seed=22)
        q = corpus[7]
        # exact runner-up among the survivors
        d = np.sum((corpus[:1000] - q) ** 2, axis=-1)
        d[7] = np.inf
        runner = int(np.argmin(d))
        gi.remove_ids([7])
        ids, _ = gi.search(q, k=1, beam=48)
        got = int(np.asarray(ids)[0, 0])
        want = runner - 1 if runner > 7 else runner  # renumbered
        assert got == want

    def test_noop_and_validation(self, corpus):
        gi = GraphIndex.build(corpus[:200], degree=8, seed=23)
        assert gi.remove_ids(np.zeros((0,), np.int32)) == 0
        assert gi.remove_ids([5, 5, 5]) == 1  # dedup counts once
        with pytest.raises(InvalidParameter):
            gi.remove_ids([500])
        with pytest.raises(InvalidParameter):
            gi.remove_ids([-1])

    def test_remove_all_then_empty(self, corpus):
        gi = GraphIndex.build(corpus[:100], degree=8, seed=24)
        assert gi.remove_ids(np.arange(100)) == 100
        assert gi.ntotal == 0
        with pytest.raises(EmptyInput):
            gi.search(corpus[:1], k=1)
        with pytest.raises(EmptyInput):
            gi.remove_ids([0])

    def test_entry_points_removed_falls_back(self, corpus):
        gi = GraphIndex.build(corpus[:800], degree=8, seed=25)
        drop = np.unique(np.asarray(gi.entry))
        gi.remove_ids(drop)
        assert gi.entry.shape[0] >= 1  # medoid fallback
        ids, _ = gi.search(corpus[:4], k=3, beam=32)
        assert (np.asarray(ids)[:, 0] >= 0).all()

    def test_save_load_after_removal(self, corpus, tmp_path):
        gi = GraphIndex.build(corpus[:600], degree=8, seed=26)
        gi.remove_ids(np.arange(0, 600, 7))
        q = corpus[1:9]
        i1, d1 = gi.search(q, 5, beam=32)
        ld = GraphIndex.load(gi.save(str(tmp_path / "gr")))
        i2, d2 = ld.search(q, 5, beam=32)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_add_after_remove(self, corpus):
        gi = GraphIndex.build(corpus[:500], degree=8, seed=27)
        gi.remove_ids(np.arange(100))
        gi.add(corpus[500:550])
        assert gi.ntotal == 450
        ids, _ = gi.search(corpus[510], k=1, beam=32)
        assert int(np.asarray(ids)[0, 0]) == 410  # 400 kept + offset 10

    def test_bridge_pads_cannot_wipe_adjacency(self):
        """Round-3 review regression: −1-padded bridge rows entered
        _augment_candidates_chunk with a FINITE distance (to row 0, via
        the max(id, 0) gather), sorted ahead of real neighbors, and the
        underfull fast path then replaced a survivor's whole adjacency
        with −1 — full disconnection. The precise invariant: −1 slots
        must never carry a finite distance out of the augment."""
        import jax.numpy as jnp

        from vq_tpu.graph import _augment_candidates_chunk

        node = jnp.zeros((1, 4), jnp.float32)
        nid = jnp.array([5], jnp.int32)
        knn_ids = jnp.array([[7, -1]], jnp.int32)
        knn_d = jnp.array([[9.0, np.inf]], jnp.float32)
        # Two −1 pads whose gathered surrogate rows (row 0 stand-ins)
        # sit AT the node — distance 0, closer than every real neighbor.
        rand_ids = jnp.array([[-1, -1, 3]], jnp.int32)
        rand_rows = jnp.zeros((1, 3, 4), jnp.float32)
        si, sd = _augment_candidates_chunk(
            node, nid, knn_ids, knn_d, rand_ids, rand_rows
        )
        si, sd = np.asarray(si)[0], np.asarray(sd)[0]
        finite = np.isfinite(sd)
        assert (si[finite] >= 0).all(), (si, sd)
        assert si[0] == 3 and si[1] == 7  # real candidates, in order

        # End-to-end smoke: removal with empty bridge rows never leaves
        # a survivor fully disconnected.
        r = np.random.default_rng(31)
        d = 8
        x = np.concatenate([
            np.zeros((1, d), np.float32),
            r.normal(0, 0.02, (1, d)).astype(np.float32),  # u, near 0
            (r.normal(0, 0.02, (4, d)) + 0.3).astype(np.float32),  # clique
            (r.normal(0, 0.05, (7, d)) + 50.0).astype(np.float32),
        ])
        gi = GraphIndex.build(x, degree=2, seed=32)
        gi.remove_ids([2, 3, 4, 5])
        g = np.asarray(gi.graph)
        assert (g >= 0).any(axis=1).all(), g

    def test_sharded_search_sees_removal(self, corpus):
        from vq_tpu.parallel import sharded_graph_search
        from vq_tpu.parallel.mesh import make_mesh

        gi = GraphIndex.build(corpus[:500], degree=8, seed=28)
        mesh = make_mesh()
        sharded_graph_search(gi, corpus[:8], k=3, mesh=mesh)
        gi.remove_ids(np.arange(50))
        ids, _ = sharded_graph_search(gi, corpus[:8], k=3, mesh=mesh)
        assert np.asarray(ids).max() < 450


class TestAddRegressions:
    """One test per bug class found in review of the incremental add."""

    def test_sharded_search_sees_added_rows(self, corpus):
        # _replica_cache must invalidate on add — a stale cache silently
        # served the pre-add graph to sharded_graph_search.
        from vq_tpu.parallel import sharded_graph_search
        from vq_tpu.parallel.mesh import make_mesh

        gi = GraphIndex.build(corpus[:500], degree=8, seed=11)
        mesh = make_mesh()
        sharded_graph_search(gi, corpus[:8], k=3, mesh=mesh)
        new = corpus[500:540]
        gi.add(new)
        ids, _ = sharded_graph_search(gi, new[:8] + 0.001, k=1, mesh=mesh)
        assert np.mean(np.asarray(ids)[:, 0] >= 500) > 0.9

    def test_bf16_sqn_consistent_across_save_load(self, corpus, tmp_path):
        # added rows' norms must come from the STORED width, or search
        # results flip near ties after a round-trip.
        gi = GraphIndex.build(
            corpus[:800], degree=8, seed=12, store_dtype="bfloat16"
        )
        gi.add(corpus[800:1000])
        q = corpus[:24] + 0.001
        i1, d1 = gi.search(q, 5, beam=32)
        ld = GraphIndex.load(gi.save(str(tmp_path / "g16")))
        i2, d2 = ld.search(q, 5, beam=32)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(
            np.asarray(d1), np.asarray(d2), rtol=1e-6
        )

    def test_backlink_cap_keeps_nearest(self):
        # When more than W new points pick the same hub, the per-node
        # backlink cap must keep the NEAREST sources, not the lowest
        # batch ids.
        r = np.random.default_rng(13)
        d = 8
        hub = np.zeros((1, d), np.float32)
        old = np.concatenate(
            [hub, (r.normal(0, 0.05, (15, d)) + 20.0).astype(np.float32)]
        )
        gi = GraphIndex.build(old, degree=2, seed=14)  # W = 4
        W = gi.graph.shape[1]
        # New points ring the hub; LAST batch rows are the closest.
        B = 12
        radii = np.linspace(2.0, 0.1, B, dtype=np.float32)
        dirs = r.normal(size=(B, d)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        new = dirs * radii[:, None]
        gi.add(new)
        hub_adj = set(np.asarray(gi.graph)[0].tolist())
        # the closest new point (highest id) must have won a slot
        assert (16 + B - 1) in hub_adj


class TestRegimeGuardrail:
    """Build-time cluster-concentration warning (round-2/3 verdict weak
    #7): the documented GraphIndex failure regime — heavy, well-separated
    clustering — must warn at build instead of silently capping recall."""

    @staticmethod
    def _clustered(noise, n=10_000, d=32, nlist=100, seed=66):
        r = np.random.default_rng(seed)
        centers = r.normal(size=(nlist, d)).astype(np.float32) * 2.0
        which = r.integers(0, nlist, n)
        return (
            centers[which] + noise * r.normal(size=(n, d))
        ).astype(np.float32)

    def test_warns_on_tight_clusters_and_persists(self, tmp_path):
        import warnings as _w

        data = self._clustered(noise=0.15)
        with pytest.warns(RuntimeWarning, match="cluster concentration"):
            gi = GraphIndex.build(data, degree=8, seed=1)
        assert gi.regime_warning is not None
        assert "IVF" in gi.regime_warning  # suggests the right tool
        # The diagnosis survives save/load.
        p = gi.save(str(tmp_path / "tight"))
        assert GraphIndex.load(p).regime_warning == gi.regime_warning

    def test_silent_on_smooth_density(self, tmp_path):
        import warnings as _w

        data = self._clustered(noise=1.0)
        with _w.catch_warnings():
            _w.simplefilter("error", RuntimeWarning)
            gi = GraphIndex.build(data, degree=8, seed=1)
        assert gi.regime_warning is None
        p = gi.save(str(tmp_path / "smooth"))
        assert GraphIndex.load(p).regime_warning is None

    def test_small_corpora_skip_the_statistic(self):
        import warnings as _w

        from vq_tpu.graph import _CONCENTRATION_MIN_ROWS

        data = self._clustered(noise=0.05, n=512, nlist=8)
        assert data.shape[0] < _CONCENTRATION_MIN_ROWS
        with _w.catch_warnings():
            _w.simplefilter("error", RuntimeWarning)
            gi = GraphIndex.build(data, degree=8, seed=1)
        assert gi.regime_warning is None

    def test_statistic_separates_regimes(self):
        import jax.numpy as jnp

        from vq_tpu.graph import (
            _CONCENTRATION_WARN,
            _concentration_stat_jit,
        )

        tight = jnp.asarray(self._clustered(noise=0.15)[:2048])
        smooth = jnp.asarray(self._clustered(noise=1.0)[:2048])
        r_tight = float(_concentration_stat_jit(tight))
        r_smooth = float(_concentration_stat_jit(smooth))
        assert r_tight < _CONCENTRATION_WARN < r_smooth

"""Lloyd's k-means engine tests (reference: src/core/vector.rs:390-461 + its
unit tests at src/core/vector.rs:463-592)."""

import numpy as np
import pytest

from vq_tpu import EmptyInput, InvalidParameter, lloyd, lloyd_batched
from vq_tpu.ops.kmeans import assign


def make_blobs(rng, n_per=50, centers=((0, 0), (10, 10), (-10, 10)), scale=0.5):
    pts = []
    for cx, cy in centers:
        pts.append(
            rng.standard_normal((n_per, 2)).astype(np.float32) * scale
            + np.array([cx, cy], dtype=np.float32)
        )
    return np.concatenate(pts)


class TestLloyd:
    def test_recovers_separated_clusters(self, rng):
        data = make_blobs(rng)
        res = lloyd(data, k=3, max_iters=50, seed=0)
        assert res.centroids.shape == (3, 2)
        # Each true center should have a centroid within 0.5
        cents = np.asarray(res.centroids)
        for c in [(0, 0), (10, 10), (-10, 10)]:
            d = np.linalg.norm(cents - np.array(c), axis=1).min()
            assert d < 0.5, f"no centroid near {c}"
        assert bool(res.converged)

    def test_determinism(self, rng):
        # fixed seed => identical output (reference property test,
        # tests/property_tests.rs:194-206)
        data = rng.random((100, 8), dtype=np.float32)
        a = lloyd(data, k=5, max_iters=10, seed=7)
        b = lloyd(data, k=5, max_iters=10, seed=7)
        np.testing.assert_array_equal(np.asarray(a.centroids), np.asarray(b.centroids))
        np.testing.assert_array_equal(
            np.asarray(a.assignments), np.asarray(b.assignments)
        )

    def test_zero_iters_returns_sampled_points(self, rng):
        # max_iters=0 -> seeded sample of k data points, untouched
        # (reference loop `for _ in 0..max_iters`, src/core/vector.rs:415)
        data = rng.random((20, 4), dtype=np.float32)
        res = lloyd(data, k=3, max_iters=0, seed=1)
        cents = np.asarray(res.centroids)
        rows = {tuple(np.round(r, 6)) for r in data}
        for c in cents:
            assert tuple(np.round(c, 6)) in rows

    def test_k_equals_n(self, rng):
        # every point its own cluster -> inertia ~ 0
        data = rng.random((10, 3), dtype=np.float32)
        res = lloyd(data, k=10, max_iters=20, seed=0)
        assert float(res.inertia) == pytest.approx(0.0, abs=1e-6)

    def test_identical_points(self):
        # degenerate data: all clusters collapse to the single point
        data = np.ones((50, 4), dtype=np.float32)
        res = lloyd(data, k=3, max_iters=10, seed=0)
        np.testing.assert_allclose(np.asarray(res.centroids), 1.0, atol=1e-6)

    def test_inertia_decreases_with_more_clusters(self, rng):
        data = rng.random((200, 6), dtype=np.float32)
        i2 = float(lloyd(data, k=2, max_iters=20, seed=0).inertia)
        i16 = float(lloyd(data, k=16, max_iters=20, seed=0).inertia)
        assert i16 < i2

    def test_blockwise_matches_singleshot(self, rng):
        data = rng.random((100, 8), dtype=np.float32)
        a = lloyd(data, k=4, max_iters=10, seed=3, block_rows=16)
        b = lloyd(data, k=4, max_iters=10, seed=3, block_rows=100)
        np.testing.assert_allclose(
            np.asarray(a.centroids), np.asarray(b.centroids), rtol=1e-5, atol=1e-5
        )

    def test_assignments_are_nearest(self, rng):
        data = rng.random((50, 4), dtype=np.float32)
        res = lloyd(data, k=5, max_iters=10, seed=0)
        codes, _ = assign(data, res.centroids)
        np.testing.assert_array_equal(np.asarray(res.assignments), np.asarray(codes))


class TestValidation:
    def test_empty(self):
        # reference: src/core/vector.rs:396-398
        with pytest.raises(EmptyInput):
            lloyd(np.zeros((0, 4), dtype=np.float32), k=2)

    def test_k_zero(self):
        # reference: src/core/vector.rs:399-404
        with pytest.raises(InvalidParameter):
            lloyd(np.ones((5, 2), dtype=np.float32), k=0)

    def test_n_less_than_k(self):
        # reference: src/core/vector.rs:405-410
        with pytest.raises(InvalidParameter) as e:
            lloyd(np.ones((3, 2), dtype=np.float32), k=5)
        assert "not enough data points" in str(e.value)


class TestBatched:
    def test_matches_independent_runs_shapewise(self, rng):
        data = rng.random((4, 60, 5), dtype=np.float32)
        cents, iters, conv = lloyd_batched(data, k=4, max_iters=15, seed=0)
        assert cents.shape == (4, 4, 5)
        assert iters.shape == (4,) and conv.shape == (4,)

    def test_batched_matches_single_runs(self, rng):
        # Each batched lane must produce exactly what a standalone lloyd run
        # with the same folded-in key produces — proves the vmap freezing
        # logic doesn't perturb converged lanes.
        import jax

        data = rng.random((3, 80, 4), dtype=np.float32)
        seed = 5
        cents, iters, conv = lloyd_batched(data, k=4, max_iters=25, seed=seed)
        base = jax.random.PRNGKey(seed)
        for b in range(3):
            single = lloyd(
                data[b], k=4, max_iters=25, key=jax.random.fold_in(base, b)
            )
            np.testing.assert_allclose(
                np.asarray(cents[b]),
                np.asarray(single.centroids),
                rtol=1e-6,
                atol=1e-6,
            )
            assert int(iters[b]) == int(single.iterations)
            assert bool(conv[b]) == bool(single.converged)

    def test_batched_determinism(self, rng):
        data = rng.random((3, 40, 4), dtype=np.float32)
        a = lloyd_batched(data, k=4, max_iters=10, seed=9)[0]
        b = lloyd_batched(data, k=4, max_iters=10, seed=9)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestKMeansPlusPlusInit:
    def test_kpp_beats_or_matches_sample_init(self):
        # Clustered data where random sample-init frequently double-books a
        # blob: k-means++ must find an equal-or-better minimum.
        rng = np.random.default_rng(12)
        centers = rng.normal(0, 5.0, (8, 16)).astype(np.float32)
        which = rng.integers(0, 8, 2000)
        data = (centers[which] + rng.normal(0, 0.1, (2000, 16))).astype(
            np.float32
        )
        worst = max(
            float(lloyd(data, 8, max_iters=15, seed=s).inertia)
            for s in range(3)
        )
        kpp = float(lloyd(data, 8, max_iters=15, seed=0, init="kmeans++").inertia)
        assert kpp <= worst * 1.001

    def test_invalid_init_rejected(self, uniform_data):
        from vq_tpu.errors import InvalidParameter

        with pytest.raises(InvalidParameter):
            lloyd(uniform_data, 4, init="magic")

    def test_kpp_deterministic(self, uniform_data):
        a = lloyd(uniform_data, 8, max_iters=4, seed=3, init="kmeans++")
        b = lloyd(uniform_data, 8, max_iters=4, seed=3, init="kmeans++")
        np.testing.assert_array_equal(
            np.asarray(a.centroids), np.asarray(b.centroids)
        )


class TestDeviceKMeansPlusPlus:
    def test_seeds_shape_and_membership(self):
        from vq_tpu.ops.kmeans import kmeans_plusplus_init_device

        rng = np.random.default_rng(21)
        data = rng.random((500, 8), dtype=np.float32)
        seeds = np.asarray(kmeans_plusplus_init_device(data, 6, seed=1))
        assert seeds.shape == (6, 8)
        rows = {tuple(r) for r in data.round(6).tolist()}
        for s in seeds.round(6).tolist():
            assert tuple(s) in rows

    def test_deterministic(self):
        from vq_tpu.ops.kmeans import kmeans_plusplus_init_device

        rng = np.random.default_rng(22)
        data = rng.random((300, 4), dtype=np.float32)
        a = np.asarray(kmeans_plusplus_init_device(data, 5, seed=7))
        b = np.asarray(kmeans_plusplus_init_device(data, 5, seed=7))
        np.testing.assert_array_equal(a, b)

    def test_spreads_over_clusters(self):
        # Well-separated blobs: D^2 seeding must hit every blob.
        from vq_tpu.ops.kmeans import kmeans_plusplus_init_device

        rng = np.random.default_rng(23)
        centers = rng.normal(0, 50.0, (6, 8)).astype(np.float32)
        which = rng.integers(0, 6, 1200)
        data = (centers[which] + rng.normal(0, 0.01, (1200, 8))).astype(
            np.float32
        )
        seeds = np.asarray(kmeans_plusplus_init_device(data, 6, seed=0))
        d = np.sum((centers[None] - seeds[:, None]) ** 2, axis=-1)
        assert len(set(d.argmin(axis=1))) == 6  # one seed per blob

    def test_degenerate_all_identical(self):
        from vq_tpu.ops.kmeans import kmeans_plusplus_init_device

        data = np.ones((50, 4), dtype=np.float32)
        seeds = np.asarray(kmeans_plusplus_init_device(data, 3, seed=0))
        np.testing.assert_array_equal(seeds, np.ones((3, 4), np.float32))

    def test_k_exceeds_n_rejected(self):
        from vq_tpu.errors import InvalidParameter
        from vq_tpu.ops.kmeans import kmeans_plusplus_init_device

        with pytest.raises(InvalidParameter):
            kmeans_plusplus_init_device(np.ones((3, 2), np.float32), 5)


class TestSphericalLloyd:
    """faiss Clustering(spherical=True) analog: centroids stay on the
    unit sphere and cluster unit-norm data by direction."""

    def test_centroids_unit_norm(self):
        import numpy as np
        from vq_tpu.ops.kmeans import lloyd

        rng = np.random.default_rng(11)
        x = rng.normal(0, 1, (600, 16)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        res = lloyd(x, 8, max_iters=10, seed=1, spherical=True)
        norms = np.linalg.norm(np.asarray(res.centroids), axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    def test_recovers_directional_clusters(self):
        import numpy as np
        from vq_tpu.ops.kmeans import lloyd

        rng = np.random.default_rng(12)
        # Two directions, members at wildly different magnitudes: plain
        # k-means splits by magnitude, spherical groups by direction.
        dirs = np.array([[1.0] + [0.0] * 15, [0.0, 1.0] + [0.0] * 14],
                        np.float32)
        which = rng.integers(0, 2, 500)
        scale = rng.uniform(0.5, 20.0, (500, 1)).astype(np.float32)
        x = dirs[which] * scale + rng.normal(0, 0.01, (500, 16)).astype(
            np.float32
        )
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        res = lloyd(xn, 2, max_iters=12, seed=2, spherical=True,
                    init="kmeans++")
        a = np.asarray(res.assignments)
        # Perfect directional separation (up to label swap).
        agree = (a == which).mean()
        assert agree in (0.0, 1.0) or agree > 0.99 or agree < 0.01

    def test_kmeanspp_spherical(self):
        import numpy as np
        from vq_tpu.ops.kmeans import lloyd

        rng = np.random.default_rng(13)
        x = rng.normal(0, 1, (400, 8)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        res = lloyd(x, 5, max_iters=6, seed=3, init="kmeans++",
                    spherical=True)
        norms = np.linalg.norm(np.asarray(res.centroids), axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


class TestFusedBlockCap:
    """VMEM sizing for the fused Lloyd accumulate: large k must shrink
    the data tile (k=2000 at TN=1024 blew the 16 MB scoped-vmem limit on
    hardware) and huge k must fall back to the XLA scan."""

    def test_small_k_keeps_full_tile(self):
        from vq_tpu.ops.kmeans import _fused_accumulate_block_cap

        assert _fused_accumulate_block_cap(256, 128) == 1024

    def test_large_k_shrinks_tile(self):
        from vq_tpu.ops.kmeans import _fused_accumulate_block_cap

        cap = _fused_accumulate_block_cap(2000, 128)
        assert 64 <= cap < 1024
        # estimated onehot footprint stays well under the scoped limit
        assert cap * 2048 * 4 <= 8 * 1024 * 1024

    def test_huge_k_falls_back(self):
        from vq_tpu.ops.kmeans import _fused_accumulate_block_cap

        assert _fused_accumulate_block_cap(20_000, 128) == 0

    def test_lloyd_runs_at_large_k(self):
        import numpy as np
        from vq_tpu.ops.kmeans import lloyd

        rng = np.random.default_rng(3)
        x = rng.normal(0, 1, (4096, 16)).astype(np.float32)
        res = lloyd(x, 2000, max_iters=2, seed=1)
        assert res.centroids.shape == (2000, 16)


class TestWeightedLloyd:
    """Sample weights (the faiss Clustering weight semantics): weighted
    means/inertia/k-means++ draws, exact duplication equivalence."""

    @pytest.fixture(scope="class")
    def wdata(self):
        r = np.random.default_rng(57)
        x = r.normal(size=(600, 8)).astype(np.float32)
        return x, x[:4].copy()

    def test_unit_weights_match_unweighted_exactly(self, wdata):
        x, seeds = wdata
        r_u = lloyd(x, 4, max_iters=10, init_centroids=seeds,
                    use_pallas=False)
        r_w = lloyd(x, 4, max_iters=10, init_centroids=seeds,
                    weights=np.ones(len(x), np.float32))
        np.testing.assert_allclose(
            np.asarray(r_u.centroids), np.asarray(r_w.centroids),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            float(r_u.inertia), float(r_w.inertia), rtol=1e-6
        )

    def test_duplication_equivalence(self, wdata):
        x, seeds = wdata
        xd = np.concatenate([x, x[:100], x[:100]])  # rows 0..99 tripled
        w = np.ones(len(x), np.float32)
        w[:100] = 3.0
        r_dup = lloyd(xd, 4, max_iters=15, init_centroids=seeds,
                      use_pallas=False)
        r_wt = lloyd(x, 4, max_iters=15, init_centroids=seeds, weights=w)
        np.testing.assert_allclose(
            np.asarray(r_dup.centroids), np.asarray(r_wt.centroids),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            float(r_dup.inertia), float(r_wt.inertia), rtol=1e-4
        )

    def test_zero_weight_points_ignored(self, wdata):
        x, seeds = wdata
        r = np.random.default_rng(58)
        junk = np.concatenate(
            [x, 100.0 * r.normal(size=(50, 8)).astype(np.float32)]
        )
        wj = np.concatenate(
            [np.ones(len(x)), np.zeros(50)]
        ).astype(np.float32)
        r_j = lloyd(junk, 4, max_iters=10, init_centroids=seeds,
                    weights=wj)
        r_u = lloyd(x, 4, max_iters=10, init_centroids=seeds,
                    use_pallas=False)
        np.testing.assert_allclose(
            np.asarray(r_j.centroids), np.asarray(r_u.centroids),
            atol=1e-5,
        )

    def test_weighted_kmeanspp_respects_support(self, wdata):
        from vq_tpu.ops.kmeans import kmeans_plusplus_init_device

        x, _ = wdata
        wk = np.zeros(len(x), np.float32)
        wk[[5, 50, 500]] = 1.0
        s = np.asarray(kmeans_plusplus_init_device(x, 3, seed=1,
                                                   weights=wk))
        allowed = x[[5, 50, 500]]
        for row in s:
            assert float(
                np.min(np.sum((allowed - row) ** 2, axis=1))
            ) < 1e-12

    def test_sample_and_kpp_inits_run(self, wdata):
        x, _ = wdata
        w = np.ones(len(x), np.float32)
        w[:100] = 3.0
        r1 = lloyd(x, 4, max_iters=3, weights=w)
        r2 = lloyd(x, 4, max_iters=3, init="kmeans++", weights=w,
                   spherical=True)
        assert np.isfinite(float(r1.inertia))
        assert np.isfinite(float(r2.inertia))

    def test_bad_weights_rejected(self, wdata):
        x, _ = wdata
        with pytest.raises(InvalidParameter):
            lloyd(x, 4, weights=np.ones(10, np.float32))
        with pytest.raises(InvalidParameter):
            lloyd(x, 4, weights=-np.ones(len(x), np.float32))
        with pytest.raises(InvalidParameter):
            lloyd(x, 4, weights=np.zeros(len(x), np.float32))


class TestWeightedSeedingContract:
    """Zero-weight points must never become centroids — through seeding,
    kmeans++, OR empty-cluster reseeds (review regression)."""

    def test_default_init_avoids_zero_weight_junk(self):
        r = np.random.default_rng(59)
        x = r.normal(size=(400, 8)).astype(np.float32)
        junk = (r.normal(size=(200, 8)) + 100.0).astype(np.float32)
        data = np.concatenate([x, junk])
        w = np.concatenate(
            [np.ones(400), np.zeros(200)]
        ).astype(np.float32)
        for init in ("sample", "kmeans++"):
            res = lloyd(data, 8, max_iters=5, seed=3, init=init,
                        weights=w)
            c = np.asarray(res.centroids)
            # no centroid anywhere near the +100 junk cloud
            assert float(np.abs(c).max()) < 50.0, init

    def test_needs_k_positive_weights(self):
        r = np.random.default_rng(60)
        x = r.normal(size=(100, 4)).astype(np.float32)
        w = np.zeros(100, np.float32)
        w[:2] = 1.0
        with pytest.raises(InvalidParameter):
            lloyd(x, 4, weights=w)

    def test_kpp_device_validates_weights(self):
        from vq_tpu.ops.kmeans import kmeans_plusplus_init_device

        r = np.random.default_rng(61)
        x = r.normal(size=(100, 4)).astype(np.float32)
        with pytest.raises(InvalidParameter):
            kmeans_plusplus_init_device(x, 3, weights=np.ones(7))
        with pytest.raises(InvalidParameter):
            kmeans_plusplus_init_device(
                x, 3, weights=-np.ones(100, np.float32)
            )

"""Unit tests for the high-level Kmeans harness (faiss ``Kmeans`` analog)."""

import numpy as np
import pytest

import vq_tpu
from vq_tpu import Kmeans
from vq_tpu.errors import InvalidParameter


def _blobs(n=600, k=4, d=8, seed=0, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)).astype(np.float32) * 3.0
    labels = rng.integers(0, k, size=n)
    pts = centers[labels] + rng.normal(size=(n, d)).astype(np.float32) * spread
    return pts.astype(np.float32), centers


class TestConstruction:
    def test_validation(self):
        with pytest.raises(InvalidParameter):
            Kmeans(0, 4)
        with pytest.raises(InvalidParameter):
            Kmeans(8, 0)
        with pytest.raises(InvalidParameter):
            Kmeans(8, 4, nredo=0)
        with pytest.raises(InvalidParameter):
            Kmeans(8, 4, niter=-1)
        with pytest.raises(InvalidParameter):
            Kmeans(8, 4, max_points_per_centroid=-1)

    def test_repr_state(self):
        km = Kmeans(8, 4)
        assert "untrained" in repr(km)
        data, _ = _blobs()
        km.train(data)
        assert "trained" in repr(km)

    def test_untrained_raises(self):
        km = Kmeans(8, 4)
        with pytest.raises(InvalidParameter):
            km.assign(np.zeros((3, 8), np.float32))
        with pytest.raises(InvalidParameter):
            _ = km.index


class TestTraining:
    def test_recovers_blobs(self):
        data, centers = _blobs()
        km = Kmeans(8, 4, niter=20, nredo=4, seed=3)
        obj = km.train(data)
        assert km.centroids.shape == (4, 8)
        assert obj == km.obj
        # each true center is close to some learned centroid
        c = np.asarray(km.centroids)
        for t in centers:
            assert np.min(np.sum((c - t) ** 2, axis=1)) < 0.1

    def test_deterministic(self):
        data, _ = _blobs(seed=1)
        a = Kmeans(8, 4, seed=7)
        b = Kmeans(8, 4, seed=7)
        a.train(data)
        b.train(data)
        np.testing.assert_array_equal(np.asarray(a.centroids), np.asarray(b.centroids))
        assert a.obj == b.obj

    def test_nredo_never_worse(self):
        data, _ = _blobs(n=400, k=6, seed=2, spread=0.5)
        single = Kmeans(8, 6, niter=4, nredo=1, seed=11)
        multi = Kmeans(8, 6, niter=4, nredo=5, seed=11)
        single.train(data)
        multi.train(data)
        assert len(multi.all_objs) == 5
        # redo 0 of both runs uses the same fold_in(seed, 0) key
        assert multi.all_objs[0] == pytest.approx(single.obj, rel=1e-6)
        assert multi.obj <= single.obj + 1e-6
        assert multi.obj == pytest.approx(min(multi.all_objs), rel=1e-6)

    def test_dim_mismatch(self):
        data, _ = _blobs(d=8)
        km = Kmeans(16, 4)
        with pytest.raises(InvalidParameter):
            km.train(data)

    def test_n_less_than_k(self):
        km = Kmeans(8, 64)
        with pytest.raises(InvalidParameter):
            km.train(np.zeros((8, 8), np.float32))

    def test_subsampling_caps_training_set(self):
        data, _ = _blobs(n=3000, k=2, d=4)
        data = data[:, :4]
        km = Kmeans(4, 2, niter=5, max_points_per_centroid=100, seed=5)
        km.train(data)
        # the best result's assignments cover only the k * mppc sample
        assert km.result.assignments.shape[0] == 200
        # disabling subsampling trains on everything
        km_full = Kmeans(4, 2, niter=5, max_points_per_centroid=0, seed=5)
        km_full.train(data)
        assert km_full.result.assignments.shape[0] == 3000

    def test_spherical_unit_norm(self):
        data, _ = _blobs()
        km = Kmeans(8, 4, spherical=True, seed=9)
        km.train(data)
        norms = np.linalg.norm(np.asarray(km.centroids), axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


class TestAssign:
    def test_assign_matches_bruteforce(self):
        data, _ = _blobs(seed=4)
        km = Kmeans(8, 4, seed=1)
        km.train(data)
        d2, labels = km.assign(data[:50])
        c = np.asarray(km.centroids)
        full = np.sum((data[:50, None, :] - c[None, :, :]) ** 2, axis=-1)
        np.testing.assert_array_equal(np.asarray(labels), np.argmin(full, axis=1))
        np.testing.assert_allclose(np.asarray(d2), np.min(full, axis=1), atol=1e-3)

    def test_index_surface(self):
        data, _ = _blobs(seed=6)
        km = Kmeans(8, 4, seed=2)
        km.train(data)
        ids, dist = km.index.search(data[:10], k=1)
        _, labels = km.assign(data[:10])
        np.testing.assert_array_equal(np.asarray(ids)[:, 0], np.asarray(labels))

    def test_assign_bad_shape(self):
        data, _ = _blobs()
        km = Kmeans(8, 4)
        km.train(data)
        with pytest.raises(InvalidParameter):
            km.assign(np.zeros((3, 5), np.float32))


def test_exported():
    assert "Kmeans" in vq_tpu.__all__


class TestWarmStartAndPersistence:
    def test_lloyd_init_centroids_refines(self):
        import vq_tpu as v

        data, centers = _blobs(seed=20)
        res = v.lloyd(data, 4, max_iters=10, init_centroids=centers)
        # starting at the true centers: converged near them, low inertia
        c = np.asarray(res.centroids)
        for t in centers:
            assert np.min(np.sum((c - t) ** 2, axis=1)) < 0.1

    def test_lloyd_init_centroids_zero_iters_identity(self):
        import vq_tpu as v

        data, centers = _blobs(seed=21)
        res = v.lloyd(data, 4, max_iters=0, init_centroids=centers)
        np.testing.assert_allclose(
            np.asarray(res.centroids), centers, atol=1e-6
        )

    def test_lloyd_init_centroids_bad_shape(self):
        import vq_tpu as v

        data, _ = _blobs()
        with pytest.raises(InvalidParameter):
            v.lloyd(data, 4, init_centroids=np.zeros((3, 8), np.float32))

    def test_kmeans_warm_start_single_run(self):
        data, centers = _blobs(seed=22)
        km = Kmeans(8, 4, niter=5, nredo=6, seed=1)
        km.train(data, init_centroids=centers)
        assert len(km.all_objs) == 1  # warm start skips the restarts

    def test_save_load_roundtrip(self, tmp_path):
        data, _ = _blobs(seed=23)
        km = Kmeans(8, 4, niter=8, nredo=2, seed=3, spherical=True)
        km.train(data)
        p = km.save(str(tmp_path / "km"))
        back = Kmeans.load(p)
        np.testing.assert_array_equal(
            np.asarray(back.centroids), np.asarray(km.centroids)
        )
        assert back.obj == km.obj and back.all_objs == km.all_objs
        assert back.spherical and back.nredo == 2
        _, lab_a = km.assign(data[:5])
        _, lab_b = back.assign(data[:5])
        np.testing.assert_array_equal(np.asarray(lab_a), np.asarray(lab_b))

    def test_load_untrained(self, tmp_path):
        km = Kmeans(8, 4)
        p = km.save(str(tmp_path / "km0"))
        back = Kmeans.load(p)
        assert back.centroids is None and "untrained" in repr(back)


class TestKmeansWeights:
    def test_weighted_train_runs_and_biases_centroids(self):
        r = np.random.default_rng(31)
        a = r.normal(0, 0.2, (300, 8)).astype(np.float32)
        b = (r.normal(0, 0.2, (300, 8)) + 5.0).astype(np.float32)
        x = np.concatenate([a, b])
        w = np.concatenate(
            [np.full(300, 100.0), np.ones(300)]
        ).astype(np.float32)
        km = Kmeans(8, 1, niter=10, seed=0)
        km.train(x, weights=w)
        # one centroid, overwhelmingly weighted toward cluster a
        c = np.asarray(km.centroids)[0]
        assert np.linalg.norm(c - a.mean(0)) < np.linalg.norm(
            c - b.mean(0)
        )

    def test_weights_follow_subsample(self):
        r = np.random.default_rng(32)
        x = r.normal(size=(4000, 4)).astype(np.float32)
        w = r.uniform(0.1, 2.0, 4000).astype(np.float32)
        km = Kmeans(4, 4, niter=3, seed=1, max_points_per_centroid=64)
        obj = km.train(x, weights=w)  # subsample cap 256 < 4000
        assert np.isfinite(obj)

    def test_bad_weight_length(self):
        r = np.random.default_rng(33)
        x = r.normal(size=(100, 4)).astype(np.float32)
        km = Kmeans(4, 4, niter=2)
        with pytest.raises(InvalidParameter):
            km.train(x, weights=np.ones(5, np.float32))

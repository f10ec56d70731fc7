"""Sharded (multi-device) training tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from vq_tpu import InvalidParameter, lloyd_batched
from vq_tpu.parallel import (
    make_mesh,
    sharded_lloyd,
    sharded_pq_train,
    shard_rows,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    return rng.random((256, 16), dtype=np.float32)


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


class TestShardedPQTrain:
    def test_codebook_shapes(self, data):
        mesh = make_mesh()
        res = sharded_pq_train(data, 4, 8, max_iters=10, seed=42, mesh=mesh)
        assert res.centroids.shape == (4, 8, 4)
        assert res.iterations.shape == (4,)
        assert float(res.inertia) > 0

    def test_matches_single_device_batched(self, data):
        # Sharded and single-device paths share key derivation, so absent
        # empty-cluster reseeds the trajectories coincide.
        mesh = make_mesh()
        res = sharded_pq_train(data, 4, 4, max_iters=20, seed=3, mesh=mesh)
        xs = np.moveaxis(data.reshape(256, 4, 4), 1, 0)
        cents, _, _ = lloyd_batched(xs, 4, max_iters=20, seed=3)
        np.testing.assert_allclose(
            np.sort(np.asarray(res.centroids), axis=1),
            np.sort(np.asarray(cents), axis=1),
            rtol=1e-3,
            atol=1e-3,
        )

    def test_determinism(self, data):
        mesh = make_mesh()
        a = sharded_pq_train(data, 2, 4, seed=11, mesh=mesh)
        b = sharded_pq_train(data, 2, 4, seed=11, mesh=mesh)
        np.testing.assert_array_equal(
            np.asarray(a.centroids), np.asarray(b.centroids)
        )

    def test_2d_mesh_subspace_parallel(self, data):
        # 4-way data x 2-way subspace sharding
        mesh = make_mesh(subspace_parallel=2)
        res = sharded_pq_train(data, 4, 8, max_iters=10, seed=0, mesh=mesh)
        assert res.centroids.shape == (4, 8, 4)
        # quality: inertia should beat the trivial all-mean codebook
        xs = data.reshape(256, 4, 4)
        base = float(((xs - xs.mean(0)) ** 2).sum())
        assert float(res.inertia) < base

    def test_presharded_input_accepted(self, data):
        mesh = make_mesh()
        global_arr = shard_rows(np.asarray(data), mesh)
        res = sharded_pq_train(global_arr, 4, 8, seed=42, mesh=mesh)
        assert res.centroids.shape == (4, 8, 4)

    def test_uneven_rows_rejected(self):
        mesh = make_mesh()
        with pytest.raises(InvalidParameter):
            sharded_pq_train(np.ones((250, 8), np.float32), 2, 4, mesh=mesh)

    def test_uneven_subspaces_rejected(self, data):
        mesh = make_mesh(subspace_parallel=2)
        with pytest.raises(InvalidParameter):
            sharded_pq_train(data, 1, 4, mesh=mesh)  # m=1 over 2 shards


class TestShardedLloyd:
    def test_centroid_quality(self):
        rng = np.random.default_rng(0)
        centers = np.array([[0, 0], [20, 20], [-20, 20], [20, -20]], np.float32)
        pts = np.concatenate(
            [
                rng.standard_normal((64, 2)).astype(np.float32) + c
                for c in centers
            ]
        )
        mesh = make_mesh()
        res = sharded_lloyd(pts, k=4, max_iters=50, seed=1, mesh=mesh)
        cents = np.asarray(res.centroids)
        assert cents.shape == (4, 2)
        for c in centers:
            assert np.linalg.norm(cents - c, axis=1).min() < 1.0

    def test_single_device_mesh(self, data):
        mesh = make_mesh(n_devices=1)
        res = sharded_lloyd(data, k=8, max_iters=10, seed=0, mesh=mesh)
        assert res.centroids.shape == (8, 16)

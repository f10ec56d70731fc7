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


class TestShardedWeightedLloyd:
    def test_unit_weights_match_unweighted_exactly(self, data):
        from vq_tpu.parallel import sharded_lloyd

        r_u = sharded_lloyd(data, 8, max_iters=8, seed=3)
        r_w = sharded_lloyd(
            data, 8, max_iters=8, seed=3,
            weights=np.ones(data.shape[0], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(r_u.centroids), np.asarray(r_w.centroids),
            atol=1e-6,
        )

    def test_weighted_objective_matches_duplication(self, data):
        from vq_tpu.parallel import sharded_lloyd

        n = data.shape[0]
        xd = np.concatenate([data, data[: n // 4]])
        w = np.ones(n, np.float32)
        w[: n // 4] = 2.0
        r_dup = sharded_lloyd(xd, 8, max_iters=12, seed=5)
        r_wt = sharded_lloyd(data, 8, max_iters=12, seed=5, weights=w)
        # different inits (n differs) — converged objectives agree
        np.testing.assert_allclose(
            float(r_dup.inertia), float(r_wt.inertia), rtol=0.05
        )

    def test_bad_weight_length(self, data):
        from vq_tpu.errors import InvalidParameter
        from vq_tpu.parallel import sharded_lloyd

        with pytest.raises(InvalidParameter):
            sharded_lloyd(data, 4, weights=np.ones(3, np.float32))

    def test_nan_weights_rejected(self, data):
        from vq_tpu.errors import InvalidParameter
        from vq_tpu.parallel import sharded_lloyd

        w = np.ones(data.shape[0], np.float32)
        w[0] = np.nan
        with pytest.raises(InvalidParameter):
            sharded_lloyd(data, 4, weights=w)


class TestShardedOPQ:
    def test_beats_plain_pq_and_warm_start(self):
        from vq_tpu.models.pq import pq_decode
        from vq_tpu.parallel import (
            sharded_opq_train,
            sharded_pq_encode,
            sharded_pq_train,
        )

        r = np.random.default_rng(67)
        d = 16
        a = r.normal(size=(d, d)) * (0.85 ** np.arange(d))[None, :]
        x = (r.normal(size=(1600, d)) @ a.T).astype(np.float32)

        rot, cb = sharded_opq_train(
            x, 4, 8, opq_iters=5, pq_iters=3, final_pq_iters=5, seed=1
        )
        rot_np = np.asarray(rot)
        np.testing.assert_allclose(
            rot_np @ rot_np.T, np.eye(d), atol=1e-4
        )
        xr = x @ rot_np
        codes = sharded_pq_encode(xr, cb)
        mse_opq = float(
            np.mean((np.asarray(pq_decode(codes, cb)) - xr) ** 2)
        )
        cb_pq = sharded_pq_train(x, 4, 8, max_iters=13, seed=1).centroids
        codes_pq = sharded_pq_encode(x, cb_pq)
        mse_pq = float(
            np.mean((np.asarray(pq_decode(codes_pq, cb_pq)) - x) ** 2)
        )
        assert mse_opq < mse_pq  # the learned rotation pays

        # warm start is a true passthrough at zero iterations
        init = np.asarray(cb)
        res0 = sharded_pq_train(
            xr, 4, 8, max_iters=0, seed=2, init_codebooks=init
        )
        np.testing.assert_allclose(
            np.asarray(res0.centroids), init, atol=0
        )

    def test_bad_init_shape(self):
        from vq_tpu.errors import InvalidParameter
        from vq_tpu.parallel import sharded_pq_train

        r = np.random.default_rng(68)
        x = r.normal(size=(200, 16)).astype(np.float32)
        with pytest.raises(InvalidParameter):
            sharded_pq_train(
                x, 4, 8, init_codebooks=np.zeros((4, 8, 2), np.float32)
            )

    def test_two_d_mesh(self):
        from vq_tpu.parallel import sharded_opq_train
        from vq_tpu.parallel.mesh import make_mesh

        r = np.random.default_rng(69)
        x = r.normal(size=(800, 16)).astype(np.float32)
        mesh = make_mesh(n_devices=8, subspace_parallel=2)
        rot, cb = sharded_opq_train(
            x, 4, 8, opq_iters=2, pq_iters=2, final_pq_iters=2,
            seed=1, mesh=mesh,
        )
        rot_np = np.asarray(rot)
        np.testing.assert_allclose(
            rot_np @ rot_np.T, np.eye(16), atol=1e-4
        )
        assert np.asarray(cb).shape == (4, 8, 4)


class TestShardedIVFSearch:
    def test_matches_single_device(self):
        # List-sharded IVF search over the 8-device mesh must return the
        # same ids as the single-device search.
        import jax

        from vq_tpu.ivf import IVFPQIndex
        from vq_tpu.parallel.ivf import sharded_ivf_search

        rng = np.random.default_rng(41)
        centers = rng.normal(0, 3.0, (20, 24)).astype(np.float32)
        which = rng.integers(0, 20, 4000)
        data = (centers[which] + rng.normal(0, 0.2, (4000, 24))).astype(
            np.float32
        )
        idx = IVFPQIndex.train(
            data[:1500], nlist=20, num_subspaces=4, num_centroids=16,
            max_iters=6,
        )
        idx.add(data)
        queries = data[:11]
        ids_1, dist_1 = idx.search(queries, k=7, nprobe=5)
        ids_s, dist_s = sharded_ivf_search(idx, queries, k=7, nprobe=5)
        np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_1))
        np.testing.assert_allclose(
            np.asarray(dist_s), np.asarray(dist_1), rtol=1e-4, atol=1e-4
        )

    def test_nlist_not_divisible_by_devices(self):
        from vq_tpu.ivf import IVFPQIndex
        from vq_tpu.parallel.ivf import sharded_ivf_search

        rng = np.random.default_rng(43)
        data = rng.random((900, 16), dtype=np.float32)
        idx = IVFPQIndex.train(
            data, nlist=13, num_subspaces=4, num_centroids=8, max_iters=4,
        )  # 13 lists over 8 devices -> padded to 16
        idx.add(data)
        ids_1, _ = idx.search(data[:5], k=4, nprobe=13)
        ids_s, _ = sharded_ivf_search(idx, data[:5], k=4, nprobe=13)
        np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_1))


class TestShardedFlatSearch:
    """Row-sharded flat serving must reproduce the single-device scans."""

    def test_pq_matches_single_device(self):
        from vq_tpu import ProductQuantizer
        from vq_tpu.parallel import sharded_flat_search
        from vq_tpu.search import PQIndex

        rng = np.random.default_rng(51)
        data = rng.random((3000, 32), dtype=np.float32)
        pq = ProductQuantizer(data, 4, 32, max_iters=5)
        idx = PQIndex(pq)
        idx.add(data)
        q = data[:9] + 0.01
        ids_1, d_1 = idx.search(q, k=6)
        ids_s, d_s = sharded_flat_search(idx, q, k=6, chunk=256)
        np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_1))
        np.testing.assert_allclose(
            np.asarray(d_s), np.asarray(d_1), atol=1e-5
        )

    def test_packed_pq_matches(self):
        from vq_tpu import ProductQuantizer
        from vq_tpu.parallel import sharded_flat_search
        from vq_tpu.search import PQIndex

        rng = np.random.default_rng(52)
        data = rng.random((1500, 16), dtype=np.float32)
        pq = ProductQuantizer(data, 4, 16, max_iters=5)
        idx = PQIndex(pq)  # auto-packed at 4 bits
        idx.add(data)
        assert idx.pack_bits == 4
        ids_1, _ = idx.search(data[:7], k=5)
        ids_s, _ = sharded_flat_search(idx, data[:7], k=5, chunk=128)
        np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_1))

    @pytest.mark.parametrize(
        "metric", ["squared_euclidean", "cosine", "dot"]
    )
    def test_sq_matches_single_device(self, metric):
        from vq_tpu.parallel import sharded_flat_search
        from vq_tpu.search import SQIndex

        rng = np.random.default_rng(53)
        data = rng.normal(0, 1, (2000, 24)).astype(np.float32)
        idx = SQIndex.from_data(data, metric=metric)
        q = data[:8] + np.float32(0.02)
        ids_1, v_1 = idx.search(q, k=6)
        ids_s, v_s = sharded_flat_search(idx, q, k=6, chunk=333)
        np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_1))
        np.testing.assert_allclose(
            np.asarray(v_s), np.asarray(v_1), atol=1e-4
        )

    def test_small_corpus_pads_with_minus_one(self):
        from vq_tpu.parallel import sharded_flat_search
        from vq_tpu.search import SQIndex

        rng = np.random.default_rng(54)
        data = rng.random((3, 8), dtype=np.float32)
        idx = SQIndex.from_data(data)
        ids, d = sharded_flat_search(idx, data[:2], k=3)
        assert np.asarray(ids).shape == (2, 3)
        assert set(np.asarray(ids)[0]) == {0, 1, 2}

    def test_rejects_unknown_index(self):
        from vq_tpu.parallel import sharded_flat_search

        with pytest.raises(InvalidParameter):
            sharded_flat_search(object(), np.zeros((1, 4), np.float32))

    def test_rq_matches_single_device(self):
        from vq_tpu.models.rq import ResidualQuantizer
        from vq_tpu.parallel import sharded_flat_search
        from vq_tpu.search import RQIndex

        rng = np.random.default_rng(55)
        data = rng.random((2500, 24), dtype=np.float32)
        idx = RQIndex(ResidualQuantizer(data, 3, 16, max_iters=5))
        idx.add(data)
        q = data[:8] + 0.01
        ids_1, d_1 = idx.search(q, k=6)
        ids_s, d_s = sharded_flat_search(idx, q, k=6, chunk=200)
        np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_1))
        np.testing.assert_allclose(
            np.asarray(d_s), np.asarray(d_1), atol=1e-5
        )


class TestShardedFlatIndexSearch:
    def test_flat_matches_single_device(self):
        from vq_tpu.parallel import sharded_flat_search
        from vq_tpu.search import FlatIndex

        rng = np.random.default_rng(53)
        data = rng.random((3000, 32), dtype=np.float32)
        for metric in ("squared_euclidean", "dot", "manhattan"):
            idx = FlatIndex.from_data(data, metric=metric)
            q = data[:7] + 0.01
            ids_1, d_1 = idx.search(q, k=6)
            ids_s, d_s = sharded_flat_search(idx, q, k=6, chunk=256)
            np.testing.assert_array_equal(
                np.asarray(ids_s), np.asarray(ids_1)
            )
            np.testing.assert_allclose(
                np.asarray(d_s), np.asarray(d_1), atol=1e-4
            )

    def test_flat_bf16_storage(self):
        from vq_tpu.parallel import sharded_flat_search
        from vq_tpu.search import FlatIndex

        rng = np.random.default_rng(54)
        data = rng.random((1000, 16), dtype=np.float32)
        idx = FlatIndex.from_data(data, storage="bfloat16")
        ids_1, _ = idx.search(data[:4], k=3)
        ids_s, _ = sharded_flat_search(idx, data[:4], k=3, chunk=128)
        np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_1))


class TestShardedIVFScanSearch:
    """List-sharded IVF-Flat / IVF-SQ / IVF-RQ serving must reproduce the
    single-device searches bit-for-bit (same scan-body code by
    construction — vq_tpu/parallel/ivf_scan.py)."""

    @pytest.fixture(scope="class")
    def corpus(self):
        rng = np.random.default_rng(61)
        centers = rng.normal(0, 3.0, (16, 24)).astype(np.float32)
        which = rng.integers(0, 16, 3000)
        return (centers[which] + rng.normal(0, 0.2, (3000, 24))).astype(
            np.float32
        )

    def _check(self, idx, q, k=6, nprobe=5):
        from vq_tpu.parallel import sharded_ivf_scan_search

        ids_1, d_1 = idx.search(q, k=k, nprobe=nprobe, use_pallas=False)
        ids_s, d_s = sharded_ivf_scan_search(idx, q, k=k, nprobe=nprobe)
        np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_1))
        np.testing.assert_allclose(
            np.asarray(d_s), np.asarray(d_1), rtol=1e-4, atol=1e-4
        )

    @pytest.mark.parametrize("metric", ["l2", "dot"])
    def test_ivf_flat(self, corpus, metric):
        from vq_tpu import IVFFlatIndex

        idx = IVFFlatIndex.train(corpus, nlist=16, seed=1, metric=metric)
        idx.add(corpus)
        self._check(idx, corpus[:9] + 0.01)

    def test_ivf_flat_bf16_and_odd_nlist(self, corpus):
        from vq_tpu import IVFFlatIndex

        # 13 lists over 8 devices -> padded to 16 with empty lists.
        idx = IVFFlatIndex.train(
            corpus, nlist=13, seed=2, store_dtype="bfloat16"
        )
        idx.add(corpus)
        self._check(idx, corpus[:5], nprobe=13)

    @pytest.mark.parametrize("by_residual", [True, False])
    def test_ivf_sq(self, corpus, by_residual):
        from vq_tpu import IVFSQIndex

        idx = IVFSQIndex.train(
            corpus, nlist=16, seed=3, by_residual=by_residual
        )
        idx.add(corpus)
        self._check(idx, corpus[:7] + 0.01)

    def test_ivf_sq_dot(self, corpus):
        from vq_tpu import IVFSQIndex

        idx = IVFSQIndex.train(corpus, nlist=16, seed=4, metric="dot")
        idx.add(corpus)
        self._check(idx, corpus[:5], nprobe=16)

    @pytest.mark.parametrize("by_residual", [True, False])
    def test_ivf_rq(self, corpus, by_residual):
        from vq_tpu import IVFRQIndex

        idx = IVFRQIndex.train(
            corpus, nlist=16, num_stages=2, num_centroids=16,
            max_iters=3, seed=5, by_residual=by_residual,
        )
        idx.add(corpus)
        self._check(idx, corpus[:7] + 0.01)

    def test_ivf_rq_dot(self, corpus):
        from vq_tpu import IVFRQIndex

        idx = IVFRQIndex.train(
            corpus, nlist=16, num_stages=2, num_centroids=16,
            max_iters=3, seed=6, metric="dot",
        )
        idx.add(corpus)
        self._check(idx, corpus[:5], nprobe=16)

    def test_pool_smaller_than_k_pads(self, corpus):
        from vq_tpu import IVFFlatIndex
        from vq_tpu.parallel import sharded_ivf_scan_search

        idx = IVFFlatIndex.train(corpus[:64], nlist=16, seed=7)
        idx.add(corpus[:64])
        ids, d = sharded_ivf_scan_search(idx, corpus[:3], k=50, nprobe=1)
        assert ids.shape == (3, 50)
        assert int((np.asarray(ids) == -1).sum()) > 0
        assert np.isinf(np.asarray(d)).any()

    def test_rejects_pq_index(self, corpus):
        from vq_tpu.ivf import IVFPQIndex
        from vq_tpu.parallel import sharded_ivf_scan_search

        idx = IVFPQIndex.train(
            corpus, nlist=8, num_subspaces=4, num_centroids=16, max_iters=3
        )
        idx.add(corpus)
        with pytest.raises(TypeError):
            sharded_ivf_scan_search(idx, corpus[:2], k=3)


class TestShardedScanPipeline:
    """Multi-chip pipelined serving: ``BatchPipeline.from_core`` over
    ``sharded_scan_search_core`` must match per-batch
    ``sharded_ivf_scan_search`` (and hence the single-device search)
    bit-for-bit, with all T batches in one dispatch."""

    @pytest.fixture(scope="class")
    def corpus(self):
        rng = np.random.default_rng(71)
        centers = rng.normal(0, 3.0, (16, 24)).astype(np.float32)
        which = rng.integers(0, 16, 2000)
        return (centers[which] + rng.normal(0, 0.2, (2000, 24))).astype(
            np.float32
        )

    def _check_pipeline(self, idx, corpus, k=6, nprobe=5):
        from vq_tpu import BatchPipeline
        from vq_tpu.parallel import (
            sharded_ivf_scan_search,
            sharded_scan_search_core,
        )

        core, arrays = sharded_scan_search_core(idx, k, nprobe=nprobe)
        pipe = BatchPipeline.from_core(core, arrays, dim=idx.dim)
        qs = np.stack([corpus[:8], corpus[8:16], corpus[16:24]]) + 0.01
        ids_p, d_p = pipe.search(qs)
        assert ids_p.shape == (3, 8, k)
        for t in range(3):
            ids_s, d_s = sharded_ivf_scan_search(
                idx, qs[t], k=k, nprobe=nprobe
            )
            np.testing.assert_array_equal(
                np.asarray(ids_p[t]), np.asarray(ids_s)
            )
            np.testing.assert_allclose(
                np.asarray(d_p[t]), np.asarray(d_s), rtol=1e-4, atol=1e-4
            )

    def test_ivf_flat(self, corpus):
        from vq_tpu import IVFFlatIndex

        idx = IVFFlatIndex.train(corpus, nlist=16, seed=1)
        idx.add(corpus)
        self._check_pipeline(idx, corpus)

    def test_ivf_sq_dot(self, corpus):
        from vq_tpu import IVFSQIndex

        idx = IVFSQIndex.train(corpus, nlist=16, seed=2, metric="dot")
        idx.add(corpus)
        self._check_pipeline(idx, corpus, nprobe=16)

    def test_ivf_rq(self, corpus):
        from vq_tpu import IVFRQIndex

        idx = IVFRQIndex.train(
            corpus, nlist=16, num_stages=2, num_centroids=16,
            max_iters=3, seed=3,
        )
        idx.add(corpus)
        self._check_pipeline(idx, corpus)

    def test_ivf_binary(self, corpus):
        from vq_tpu import IVFBinaryIndex

        idx = IVFBinaryIndex.train(corpus, nlist=16, seed=4)
        idx.add(corpus)
        self._check_pipeline(idx, corpus)

    def test_dim_mismatch_raises(self, corpus):
        from vq_tpu import BatchPipeline, IVFFlatIndex
        from vq_tpu.errors import DimensionMismatch
        from vq_tpu.parallel import sharded_scan_search_core

        idx = IVFFlatIndex.train(corpus, nlist=16, seed=5)
        idx.add(corpus)
        core, arrays = sharded_scan_search_core(idx, 3, nprobe=2)
        pipe = BatchPipeline.from_core(core, arrays, dim=idx.dim)
        with pytest.raises(DimensionMismatch):
            pipe.search(np.zeros((2, 4, idx.dim + 1), np.float32))

    def test_flat_graph_ivfpq_cores(self, corpus):
        # every sharded serving path exposes a pipeline-ready core
        from vq_tpu import (
            BatchPipeline,
            GraphIndex,
            IVFPQIndex,
            PQIndex,
            ProductQuantizer,
        )
        from vq_tpu.parallel import (
            sharded_flat_search,
            sharded_flat_search_core,
            sharded_graph_search,
            sharded_graph_search_core,
            sharded_ivf_search,
            sharded_ivf_search_core,
        )
        from vq_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        qs = np.stack([corpus[:8], corpus[8:16]]) + 0.01

        from vq_tpu import (
            FlatIndex,
            PerDimScalarQuantizer,
            ResidualQuantizer,
            RQIndex,
            SQIndex,
        )

        pq = PQIndex(ProductQuantizer(corpus, 4, 16, max_iters=3, seed=1))
        pq.add(corpus)
        g = GraphIndex.build(corpus[:800], degree=8, seed=2)
        ivf = IVFPQIndex.train(corpus, 8, 4, 16, max_iters=3, seed=3)
        ivf.add(corpus)
        flat = FlatIndex.from_data(corpus, metric="manhattan")
        sq = SQIndex(PerDimScalarQuantizer.from_data(corpus, 16))
        sq.add(corpus)
        rq = RQIndex(ResidualQuantizer(corpus, 2, 16, max_iters=3, seed=4))
        rq.add(corpus)
        cases = [
            (pq, sharded_flat_search_core, sharded_flat_search, {}),
            (flat, sharded_flat_search_core, sharded_flat_search, {}),
            (sq, sharded_flat_search_core, sharded_flat_search, {}),
            (rq, sharded_flat_search_core, sharded_flat_search, {}),
            (g, sharded_graph_search_core, sharded_graph_search,
             {"beam": 32}),
            (ivf, sharded_ivf_search_core, sharded_ivf_search,
             {"nprobe": 4}),
        ]
        for idx, core_fn, search_fn, kw in cases:
            core, arrays = core_fn(idx, 6, mesh=mesh, **kw)
            pipe = BatchPipeline.from_core(core, arrays, dim=24)
            ip, vp = pipe.search(qs)
            for t in range(2):
                i_s, v_s = search_fn(idx, qs[t], k=6, mesh=mesh, **kw)
                np.testing.assert_array_equal(
                    np.asarray(ip[t]), np.asarray(i_s)
                )
                np.testing.assert_allclose(
                    np.asarray(vp[t]), np.asarray(v_s),
                    rtol=1e-4, atol=1e-4,
                )

    def test_pool_padding_through_pipeline(self, corpus):
        from vq_tpu import BatchPipeline, IVFFlatIndex
        from vq_tpu.parallel import sharded_scan_search_core

        idx = IVFFlatIndex.train(corpus[:64], nlist=16, seed=6)
        idx.add(corpus[:64])
        core, arrays = sharded_scan_search_core(idx, 50, nprobe=1)
        pipe = BatchPipeline.from_core(core, arrays, dim=idx.dim)
        ids, d = pipe.search(corpus[None, :3])
        assert ids.shape == (1, 3, 50)
        assert int((np.asarray(ids) == -1).sum()) > 0
        assert np.isinf(np.asarray(d)).any()


class TestShardedRefineSearch:
    """Multi-chip RefineIndex: sharded base + replicated refine codes
    must exactly match the single-device refined search."""

    @pytest.fixture(scope="class")
    def corpus(self):
        rng = np.random.default_rng(83)
        centers = rng.normal(0, 3.0, (12, 24)).astype(np.float32)
        which = rng.integers(0, 12, 2000)
        return (centers[which] + rng.normal(0, 0.3, (2000, 24))).astype(
            np.float32
        )

    def test_ivfpq_sq8(self, corpus):
        from vq_tpu import IVFPQIndex, RefineIndex
        from vq_tpu.parallel import sharded_refine_search

        base = IVFPQIndex.train(corpus, 8, 4, 16, max_iters=3, seed=1)
        ref = RefineIndex(base, "sq8")
        ref.add(corpus)
        q = corpus[:9] + 0.01
        i1, d1 = ref.search(q, 6, k_factor=4, nprobe=4)
        i2, d2 = sharded_refine_search(ref, q, 6, k_factor=4, nprobe=4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(
            np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-4
        )

    def test_residual_pqr_over_pq_pipelined(self, corpus):
        from vq_tpu import BatchPipeline, PQIndex, ProductQuantizer, RefineIndex
        from vq_tpu.parallel import (
            sharded_refine_search,
            sharded_refine_search_core,
        )
        from vq_tpu.parallel.mesh import make_mesh

        base = PQIndex(ProductQuantizer(corpus, 4, 16, max_iters=3, seed=2))
        ref = RefineIndex.train_pq(base, corpus, 4, 16, max_iters=3, seed=3)
        ref.add(corpus)
        mesh = make_mesh()
        core, arrays = sharded_refine_search_core(
            ref, 6, k_factor=4, mesh=mesh
        )
        pipe = BatchPipeline.from_core(core, arrays, dim=24)
        qs = np.stack([corpus[:8], corpus[8:16]]) + 0.01
        ip, _ = pipe.search(qs)
        for t in range(2):
            i_s, _ = sharded_refine_search(
                ref, qs[t], 6, k_factor=4, mesh=mesh
            )
            np.testing.assert_array_equal(
                np.asarray(ip[t]), np.asarray(i_s)
            )
            i_1, _ = ref.search(qs[t], 6, k_factor=4)
            np.testing.assert_array_equal(
                np.asarray(ip[t]), np.asarray(i_1)
            )

    def test_unsupported_base_raises(self, corpus):
        from vq_tpu import BinaryIndex, RefineIndex
        from vq_tpu.errors import InvalidParameter
        from vq_tpu.parallel import sharded_refine_search

        ref = RefineIndex(BinaryIndex(24), "flat")
        ref.add(corpus)
        with pytest.raises(InvalidParameter):
            sharded_refine_search(ref, corpus[:2], 3)


class TestShardedGraphSearch:
    """Query-parallel GraphIndex serving: sharded batch, replicated
    index, identical results to the single-device search."""

    @pytest.fixture(scope="class")
    def graph_setup(self):
        from vq_tpu import GraphIndex

        r = np.random.default_rng(81)
        centers = r.normal(0, 3.0, (12, 24)).astype(np.float32)
        which = r.integers(0, 12, 3000)
        x = (centers[which] + r.normal(0, 0.4, (3000, 24))).astype(
            np.float32
        )
        return x, GraphIndex.build(x, degree=16, seed=2)

    def test_matches_single_device(self, graph_setup):
        from vq_tpu.parallel import sharded_graph_search

        x, gi = graph_setup
        q = x[:24] + 0.01
        ids_1, d_1 = gi.search(q, k=6, beam=32)
        ids_s, d_s = sharded_graph_search(gi, q, k=6, beam=32)
        np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_1))
        np.testing.assert_allclose(
            np.asarray(d_s), np.asarray(d_1), rtol=1e-4, atol=1e-4
        )

    def test_query_count_not_divisible(self, graph_setup):
        from vq_tpu.parallel import sharded_graph_search

        x, gi = graph_setup
        q = x[:13]  # 13 over 8 devices -> padded internally
        ids_1, _ = gi.search(q, k=4, beam=32)
        ids_s, _ = sharded_graph_search(gi, q, k=4, beam=32)
        np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_1))


def test_sharded_scan_placement_cached():
    """Serving loops must not re-broadcast the bucket structure every
    batch (review finding): the sharded placement is cached per build."""
    from vq_tpu import IVFFlatIndex
    from vq_tpu.parallel import sharded_ivf_scan_search

    r = np.random.default_rng(97)
    x = r.normal(0, 1, (600, 16)).astype(np.float32)
    idx = IVFFlatIndex.train(x, nlist=8, seed=1)
    idx.add(x)
    sharded_ivf_scan_search(idx, x[:4], k=3)
    cache = idx._shard_cache
    sharded_ivf_scan_search(idx, x[:4], k=3)
    assert idx._shard_cache is cache
    idx.add(x[:8])  # invalidates buckets -> new placement on next search
    sharded_ivf_scan_search(idx, x[:4], k=3)
    assert idx._shard_cache is not cache


def test_sharded_binary_ivf_matches_single_device():
    from vq_tpu import IVFBinaryIndex
    from vq_tpu.parallel import sharded_ivf_scan_search

    r = np.random.default_rng(103)
    centers = r.normal(0, 2.0, (10, 40)).astype(np.float32)
    x = (centers[r.integers(0, 10, 1500)]
         + r.normal(0, 0.3, (1500, 40))).astype(np.float32)
    idx = IVFBinaryIndex.train(x, nlist=10, seed=2)
    idx.add(x)
    q = x[:9] + 0.05
    ids_1, d_1 = idx.search(q, k=5, nprobe=4)
    ids_s, d_s = sharded_ivf_scan_search(idx, q, k=5, nprobe=4)
    # Hamming values always agree; ids may permute among exact ties.
    np.testing.assert_array_equal(
        np.sort(np.asarray(d_s), 1), np.sort(np.asarray(d_1), 1)
    )
    same = np.asarray(ids_s) == np.asarray(ids_1)
    ties = np.asarray(d_s) == np.asarray(d_1)
    assert (same | ties).all()


class TestShardedStreaming:
    """sharded_pq_minibatch_update == pq_minibatch_update on the global
    batch (exact online-mean update; psum-merged stats)."""

    def test_matches_single_device(self, data):
        import jax.numpy as jnp

        from vq_tpu.ops.kmeans_stream import pq_minibatch_update
        from vq_tpu.parallel import make_mesh, sharded_pq_minibatch_update

        m, k, s = 4, 8, data.shape[1] // 4
        r = np.random.default_rng(3)
        cents = jnp.asarray(r.random((m, k, s), dtype=np.float32))
        counts = jnp.asarray(r.integers(0, 40, (m, k)).astype(np.float32))
        batch = data[:128]
        mesh = make_mesh()
        nc_s, nt_s, in_s = sharded_pq_minibatch_update(
            cents, counts, batch, mesh=mesh
        )
        nc_1, nt_1, in_1 = pq_minibatch_update(cents, counts, batch)
        np.testing.assert_allclose(
            np.asarray(nc_s), np.asarray(nc_1), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(nt_s), np.asarray(nt_1))
        np.testing.assert_allclose(
            np.asarray(in_s), np.asarray(in_1), rtol=1e-5
        )

    def test_chained_stream_converges_like_single(self, data):
        """A few chained sharded steps track the single-device stream."""
        import jax.numpy as jnp

        from vq_tpu.ops.kmeans_stream import pq_minibatch_update
        from vq_tpu.parallel import make_mesh, sharded_pq_minibatch_update

        m, k, s = 2, 4, data.shape[1] // 2
        r = np.random.default_rng(5)
        cents = jnp.asarray(r.random((m, k, s), dtype=np.float32))
        counts = jnp.zeros((m, k), jnp.float32)
        c1, t1 = cents, counts
        cs, ts = cents, counts
        mesh = make_mesh()
        for lo in range(0, 256, 128):
            b = data[lo:lo + 128]
            c1, t1, _ = pq_minibatch_update(c1, t1, b)
            cs, ts, _ = sharded_pq_minibatch_update(cs, ts, b, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(cs), np.asarray(c1), rtol=1e-4, atol=1e-5
        )

    def test_uneven_rows_rejected(self):
        from vq_tpu.errors import InvalidParameter
        from vq_tpu.parallel import make_mesh, sharded_pq_minibatch_update

        mesh = make_mesh()
        import jax.numpy as jnp

        with pytest.raises(InvalidParameter):
            sharded_pq_minibatch_update(
                jnp.zeros((2, 4, 4)), jnp.zeros((2, 4)),
                jnp.zeros((130, 8)), mesh=mesh,
            )


class TestOverlapSplit:
    """Perf-backlog #5: the two-half psum/compute overlap split must not
    change results — counts exactly (whole numbers in f32), centroid
    accumulators to f32 reduction-order tolerance."""

    def test_minibatch_overlap_matches_serial_psum(self):
        import jax.numpy as jnp

        from vq_tpu.parallel import make_mesh
        from vq_tpu.parallel.stream import sharded_pq_minibatch_update

        mesh = make_mesh()
        rng = np.random.default_rng(17)
        m, k, s = 4, 16, 8
        cents = jnp.asarray(rng.normal(0, 1, (m, k, s)), jnp.float32)
        counts = jnp.asarray(
            rng.integers(0, 50, (m, k)).astype(np.float32)
        )
        batch = jnp.asarray(rng.normal(0, 1, (256, m * s)), jnp.float32)
        c_ov, n_ov, i_ov = sharded_pq_minibatch_update(
            cents, counts, batch, mesh=mesh, overlap=True
        )
        c_sq, n_sq, i_sq = sharded_pq_minibatch_update(
            cents, counts, batch, mesh=mesh, overlap=False
        )
        np.testing.assert_array_equal(np.asarray(n_ov), np.asarray(n_sq))
        np.testing.assert_allclose(
            np.asarray(c_ov), np.asarray(c_sq), rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(i_ov), np.asarray(i_sq), rtol=1e-5
        )

    def test_lloyd_accumulate_overlap_matches_serial_psum(self):
        import jax.numpy as jnp

        from vq_tpu.parallel import make_mesh
        from vq_tpu.parallel.kmeans import _make_sharded_step

        mesh = make_mesh()
        rng = np.random.default_rng(18)
        m, k, s = 2, 8, 4
        n = 512
        xs = jnp.asarray(
            rng.normal(0, 1, (n, m, s)), jnp.float32
        )
        cb = jnp.asarray(rng.normal(0, 1, (m, k, s)), jnp.float32)
        outs = {}
        for ov in (True, False):
            # block_rows small enough that each local shard really
            # splits in two non-empty halves.
            step = _make_sharded_step(mesh, block_rows=8, overlap=ov)
            outs[ov] = step(xs, cb)
        s_ov, c_ov, i_ov = outs[True]
        s_sq, c_sq, i_sq = outs[False]
        np.testing.assert_array_equal(np.asarray(c_ov), np.asarray(c_sq))
        np.testing.assert_allclose(
            np.asarray(s_ov), np.asarray(s_sq), rtol=0, atol=1e-4
        )
        np.testing.assert_allclose(
            float(i_ov), float(i_sq), rtol=1e-5
        )

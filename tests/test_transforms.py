"""Vector transforms, TransformedIndex, index_factory, IdMapIndex."""

import numpy as np
import pytest

from vq_tpu import (
    CenteringTransform,
    FlatIndex,
    IdMapIndex,
    NormalizeTransform,
    PCATransform,
    RotationTransform,
    TransformedIndex,
    index_factory,
    load_index,
)
from vq_tpu.errors import (
    DimensionMismatch,
    EmptyInput,
    InvalidData,
    InvalidParameter,
)


@pytest.fixture(scope="module")
def data(rng):
    # low-rank + noise so PCA has real structure
    basis = rng.standard_normal((8, 32)).astype(np.float32)
    coef = rng.standard_normal((2000, 8)).astype(np.float32)
    return coef @ basis + 0.05 * rng.standard_normal((2000, 32)).astype(
        np.float32
    )


class TestPCATransform:
    def test_projection_recovers_structure(self, data):
        t = PCATransform(32, 8).fit(data)
        y = np.asarray(t.apply(data))
        assert y.shape == (2000, 8)
        back = np.asarray(t.reverse(y))
        # 8 components capture the rank-8 signal; residual is the noise
        rel = np.linalg.norm(back - data) / np.linalg.norm(data)
        assert rel < 0.05

    def test_whiten_unit_variance(self, data):
        t = PCATransform(32, 8, whiten=True).fit(data)
        y = np.asarray(t.apply(data))
        np.testing.assert_allclose(y.var(axis=0), 1.0, rtol=0.05)

    def test_full_rank_roundtrip_exact(self, data):
        t = PCATransform(32).fit(data)
        back = np.asarray(t.reverse(t.apply(data[:50])))
        np.testing.assert_allclose(back, data[:50], atol=1e-3)

    def test_explained_variance_descending(self, data):
        t = PCATransform(32, 16).fit(data)
        ev = np.asarray(t.explained_variance)
        assert (np.diff(ev) <= 1e-5).all()
        assert (ev >= 0).all()

    def test_unfitted_raises(self, data):
        t = PCATransform(32, 8)
        assert not t.is_fitted
        with pytest.raises(InvalidData):
            t.apply(data)
        with pytest.raises(InvalidData):
            _ = t.explained_variance

    def test_validation(self, data):
        with pytest.raises(InvalidParameter):
            PCATransform(32, 0)
        with pytest.raises(InvalidParameter):
            PCATransform(32, 33)
        with pytest.raises(InvalidData):
            PCATransform(32).fit(data[:1])
        with pytest.raises(DimensionMismatch):
            PCATransform(16).fit(data)


class TestRotationTransform:
    def test_orthonormal_and_invertible(self, data):
        t = RotationTransform.random(32, seed=3)
        r = np.asarray(t.matrix)
        np.testing.assert_allclose(r @ r.T, np.eye(32), atol=1e-5)
        back = np.asarray(t.reverse(t.apply(data[:20])))
        np.testing.assert_allclose(back, data[:20], atol=1e-4)

    def test_deterministic_by_seed(self):
        a = np.asarray(RotationTransform.random(16, seed=7).matrix)
        b = np.asarray(RotationTransform.random(16, seed=7).matrix)
        c = np.asarray(RotationTransform.random(16, seed=8).matrix)
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, c)

    def test_preserves_distances(self, data):
        t = RotationTransform.random(32, seed=1)
        x = data[:10]
        y = np.asarray(t.apply(x))
        dx = ((x[:, None] - x[None, :]) ** 2).sum(-1)
        dy = ((y[:, None] - y[None, :]) ** 2).sum(-1)
        np.testing.assert_allclose(dx, dy, rtol=1e-3, atol=1e-3)


class TestSimpleTransforms:
    def test_normalize(self, data):
        t = NormalizeTransform(32)
        y = np.asarray(t.apply(data[:100]))
        np.testing.assert_allclose(
            np.linalg.norm(y, axis=1), 1.0, atol=1e-5
        )
        zero = np.zeros((1, 32), np.float32)
        np.testing.assert_array_equal(np.asarray(t.apply(zero)), zero)
        with pytest.raises(InvalidData):
            t.reverse(y)

    def test_centering_roundtrip(self, data):
        t = CenteringTransform(32).fit(data)
        y = np.asarray(t.apply(data[:50]))
        np.testing.assert_allclose(
            y.mean(axis=0), data[:50].mean(axis=0) - data.mean(axis=0),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(t.reverse(y)), data[:50], atol=1e-5
        )


class TestTransformedIndex:
    def test_pca_flat_search_matches_projected(self, data):
        t = PCATransform(32, 16).fit(data)
        idx = TransformedIndex([t], FlatIndex(16))
        idx.add(data)
        assert idx.ntotal == 2000
        ids, _ = idx.search(data[10:13], k=1)
        # projection preserves enough structure for self-retrieval
        np.testing.assert_array_equal(
            np.asarray(ids)[:, 0], [10, 11, 12]
        )

    def test_reconstruct_reverses_chain(self, data):
        t = RotationTransform.random(32, seed=5)
        idx = TransformedIndex([t], FlatIndex(32))
        idx.add(data[:100])
        rec = np.asarray(idx.reconstruct([7]))
        np.testing.assert_allclose(rec[0], data[7], atol=1e-4)

    def test_chain_dim_check(self, data):
        with pytest.raises(DimensionMismatch):
            TransformedIndex(
                [PCATransform(32, 8), NormalizeTransform(16)], FlatIndex(16)
            )
        with pytest.raises(DimensionMismatch):
            TransformedIndex([PCATransform(32, 8)], FlatIndex(9))

    def test_save_load(self, data, tmp_path):
        t = PCATransform(32, 8).fit(data)
        idx = TransformedIndex([t], FlatIndex(8))
        idx.add(data[:300])
        p = idx.save(str(tmp_path / "tindex.npz"))
        idx2 = TransformedIndex.load(p)
        assert idx2.ntotal == 300
        q = data[5:8]
        np.testing.assert_array_equal(
            np.asarray(idx.search(q, k=3)[0]),
            np.asarray(idx2.search(q, k=3)[0]),
        )

    def test_generic_load_index(self, data, tmp_path):
        t = NormalizeTransform(32)
        idx = TransformedIndex([t], FlatIndex(32, metric="dot"))
        idx.add(data[:100])
        p = idx.save(str(tmp_path / "gen.npz"))
        idx2 = load_index(p)
        assert isinstance(idx2, TransformedIndex)
        assert idx2.base.metric == "dot"


class TestIndexFactory:
    def test_flat_needs_no_training(self, data):
        idx = index_factory(32, "Flat")
        assert idx.is_trained
        idx.add(data[:500])
        ids, _ = idx.search(data[3:4], k=1)
        assert int(np.asarray(ids)[0, 0]) == 3

    def test_untrained_raises(self, data):
        idx = index_factory(32, "PQ8")
        assert not idx.is_trained
        with pytest.raises(InvalidData):
            idx.add(data)

    def test_pq_pipeline(self, data):
        idx = index_factory(32, "PQ8x4").train(data, max_iters=4)
        idx.add(data)
        ids, d = idx.search(data[:5], k=3)
        assert np.asarray(ids).shape == (5, 3)

    def test_pca_sq_pipeline(self, data):
        idx = index_factory(32, "PCA16,SQ8").train(data)
        idx.add(data)
        ids, _ = idx.search(data[20:23], k=1)
        np.testing.assert_array_equal(
            np.asarray(ids)[:, 0], [20, 21, 22]
        )

    def test_ivf_flat_pipeline(self, data):
        idx = index_factory(32, "IVF16,Flat", metric="l2").train(
            data, max_iters=4
        )
        idx.add(data)
        ids, _ = idx.search(data[40:42], k=1, nprobe=4)
        np.testing.assert_array_equal(np.asarray(ids)[:, 0], [40, 41])

    def test_ivf_pq_pipeline(self, data):
        idx = index_factory(32, "IVF8,PQ4", metric="l2").train(
            data, max_iters=3
        )
        idx.add(data)
        ids, d = idx.search(data[:4], k=5, nprobe=8)
        assert np.asarray(ids).shape == (4, 5)

    def test_opq_reuses_codebooks(self, data):
        idx = index_factory(32, "OPQ4,PQ4").train(data, max_iters=3)
        idx.add(data[:200])
        ids, _ = idx.search(data[:3], k=2)
        assert np.asarray(ids).shape == (3, 2)

    def test_sqfp16_is_half_flat(self, data):
        idx = index_factory(32, "SQfp16")
        assert idx.is_trained
        idx.add(data[:100])
        assert idx.index.storage == "float16"

    def test_rq_pipeline(self, data):
        idx = index_factory(32, "RQ2x4").train(data, max_iters=3)
        idx.add(data[:300])
        ids, _ = idx.search(data[:2], k=4)
        assert np.asarray(ids).shape == (2, 4)

    def test_bad_specs(self):
        for spec in ("", "PQ8,Flat", "IVF16", "IVF16,BFlat", "Nope",
                     "PQ8x9", "IVF2x,Flat"):
            with pytest.raises(InvalidParameter):
                index_factory(32, spec)

    def test_metric_aliases_and_rejections(self, data):
        idx = index_factory(32, "Flat", metric="ip")
        idx.add(data[:50])
        _, scores = idx.search(data[:2], k=2)
        assert (np.diff(np.asarray(scores), axis=1) <= 1e-5).all()
        with pytest.raises(InvalidParameter):
            index_factory(32, "IVF8,Flat", metric="cosine").train(data)
        with pytest.raises(InvalidParameter):
            index_factory(32, "PQ8", metric="dot").train(data)

    def test_save_via_factory_then_generic_load(self, data, tmp_path):
        idx = index_factory(32, "PCA8,PQ4x4").train(data, max_iters=3)
        idx.add(data[:200])
        p = idx.save(str(tmp_path / "fact.npz"))
        idx2 = load_index(p)
        q = data[:3]
        np.testing.assert_array_equal(
            np.asarray(idx.search(q, k=2)[0]),
            np.asarray(idx2.search(q, k=2)[0]),
        )


class TestIdMapIndex:
    def test_add_with_ids_and_search(self, data):
        idx = IdMapIndex(FlatIndex(32))
        ids = np.arange(1000, 1200, dtype=np.int64) * 7
        idx.add_with_ids(data[:200], ids)
        assert idx.ntotal == 200
        got, _ = idx.search(data[10:12], k=1)
        np.testing.assert_array_equal(
            np.asarray(got)[:, 0], ids[[10, 11]]
        )

    def test_factory_idmap_spec(self, data):
        idx = index_factory(32, "IDMap,Flat")
        idx.add_with_ids(data[:50], np.arange(50, dtype=np.int64) + 10_000)
        got, _ = idx.search(data[7:8], k=1)
        assert int(np.asarray(got)[0, 0]) == 10_007

    def test_duplicate_ids_rejected(self, data):
        idx = IdMapIndex(FlatIndex(32))
        idx.add_with_ids(data[:5], np.arange(5))
        with pytest.raises(InvalidParameter):
            idx.add_with_ids(data[5:10], np.arange(4, 9))
        with pytest.raises(InvalidParameter):
            idx.add_with_ids(data[5:7], np.array([99, 99]))

    def test_remove_by_user_id(self, data):
        idx = IdMapIndex(FlatIndex(32))
        idx.add_with_ids(data[:10], np.arange(10) * 100)
        assert idx.remove_ids([300, 500, 99999]) == 2
        assert idx.ntotal == 8
        got, _ = idx.search(data[4:5], k=1)
        assert int(np.asarray(got)[0, 0]) == 400

    def test_reconstruct_by_user_id(self, data):
        idx = IdMapIndex(FlatIndex(32))
        idx.add_with_ids(data[:10], np.arange(10)[::-1] + 50)  # 59..50
        rec = np.asarray(idx.reconstruct([59, 50]))
        np.testing.assert_array_equal(rec, data[[0, 9]])
        with pytest.raises(InvalidParameter):
            idx.reconstruct([1234])

    def test_range_search_translates(self, data):
        idx = IdMapIndex(FlatIndex(32))
        idx.add_with_ids(data[:100], np.arange(100, dtype=np.int64) + 777)
        ids_r, vals, counts = idx.range_search(
            data[:2], 1e9, max_results=100
        )
        assert (np.asarray(ids_r) >= 777).all()
        np.testing.assert_array_equal(np.asarray(counts), [100, 100])

    def test_save_load(self, data, tmp_path):
        idx = IdMapIndex(FlatIndex(32))
        idx.add_with_ids(data[:30], np.arange(30, dtype=np.int64) * 3)
        p = idx.save(str(tmp_path / "idmap.npz"))
        idx2 = load_index(p)
        assert isinstance(idx2, IdMapIndex)
        got1, _ = idx.search(data[:2], k=2)
        got2, _ = idx2.search(data[:2], k=2)
        np.testing.assert_array_equal(np.asarray(got1), np.asarray(got2))

    def test_empty_remove_raises(self):
        idx = IdMapIndex(FlatIndex(8))
        with pytest.raises(EmptyInput):
            idx.remove_ids([1])


class TestLSH:
    """faiss IndexLSH analog: LSH{nbits} = seeded random orthonormal
    projection + sign bits + packed Hamming search."""

    @pytest.fixture(scope="class")
    def corpus(self):
        r = np.random.default_rng(91)
        centers = r.normal(0, 3.0, (8, 48)).astype(np.float32)
        which = r.integers(0, 8, 2000)
        return (centers[which] + r.normal(0, 0.4, (2000, 48))).astype(
            np.float32
        )

    def test_projection_orthonormal_columns(self):
        from vq_tpu.transforms import RotationTransform

        t = RotationTransform.random(48, seed=3, d_out=16)
        m = np.asarray(t.matrix)
        assert m.shape == (48, 16)
        np.testing.assert_allclose(m.T @ m, np.eye(16), atol=1e-5)

    def test_factory_lsh_builds_and_searches(self, corpus):
        from vq_tpu import index_factory

        f = index_factory(48, "LSH48")
        assert f.is_trained  # seeded projection, nothing to fit
        f.add(corpus)
        ids, ham = f.search(corpus[:16], k=10)
        assert np.asarray(ids).shape == (16, 10)
        # LSH preserves locality: self-match must rank first for most
        # queries (sign bits of a row match themselves exactly).
        assert (np.asarray(ids)[:, 0] == np.arange(16)).mean() >= 0.9
        # LSH's guarantee is bucket locality, not fine ranking: sign
        # bits can't order same-cluster near-ties, so assert the top-10
        # come from the query's true cluster (sign-pattern locality),
        # plus a loose recall floor far above random (~0.005).
        d = np.sum((corpus[None] - corpus[:16, None]) ** 2, -1)
        gt = np.argsort(d, 1)[:, :10]
        got = np.asarray(ids)
        rec = np.mean([
            len(set(got[i].tolist()) & set(gt[i].tolist())) / 10
            for i in range(16)
        ])
        assert rec > 0.05
        same_cluster = np.mean([
            (d[i, got[i]] < 2.0 * np.median(d[i])).mean()
            for i in range(16)
        ])
        assert same_cluster > 0.95

    def test_lsh_exceeding_dim_rejected(self):
        from vq_tpu import index_factory
        from vq_tpu.errors import InvalidParameter

        with pytest.raises(InvalidParameter):
            index_factory(16, "LSH32").train(None)

    def test_lsh_save_load(self, corpus, tmp_path):
        from vq_tpu import index_factory, load_index

        f = index_factory(48, "LSH16")
        f.add(corpus[:200])
        p = f.index.save(str(tmp_path / "lsh.npz"))
        back = load_index(p)
        ids0, _ = f.search(corpus[:4], k=3)
        ids1, _ = back.search(corpus[:4], k=3)
        np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))


class TestIdMapReviewRegressions:
    def test_int64_ids_survive_translate(self):
        """Review regression: jnp.asarray silently truncated int64 user
        ids >= 2^31 to int32 ([2**40, 5] -> [0, 5])."""
        from vq_tpu import IdMapIndex
        from vq_tpu.search import FlatIndex

        r = np.random.default_rng(7)
        x = r.normal(0, 1, (16, 8)).astype(np.float32)
        idx = IdMapIndex(FlatIndex(8))
        big = np.arange(16, dtype=np.int64) + 2**40
        idx.add_with_ids(x, big)
        ids, _ = idx.search(x[:3], k=1)
        assert np.asarray(ids).dtype == np.int64
        np.testing.assert_array_equal(np.asarray(ids)[:, 0], big[:3])
        rec = idx.reconstruct(big[:2])
        np.testing.assert_allclose(np.asarray(rec), x[:2], rtol=1e-6)

    def test_reconstruct_empty_raises(self):
        from vq_tpu import IdMapIndex
        from vq_tpu.errors import EmptyInput
        from vq_tpu.search import FlatIndex

        with pytest.raises(EmptyInput):
            IdMapIndex(FlatIndex(8)).reconstruct([0])


class TestITQ:
    """Iterative Quantization (faiss ITQMatrix analog): learned rotation
    minimizing binarization error on PCA'd data."""

    @pytest.fixture(scope="class")
    def correlated(self):
        r = np.random.default_rng(41)
        d = 32
        a = r.normal(size=(d, d)) * (0.9 ** np.arange(d))[None, :]
        x = (r.normal(size=(3000, d)) @ a.T).astype(np.float32)
        q = (r.normal(size=(24, d)) @ a.T).astype(np.float32)
        return x, q

    def test_rotation_is_orthogonal(self, correlated):
        from vq_tpu import itq_train

        x, _ = correlated
        chain = itq_train(x, 16, seed=1)
        assert len(chain) == 2
        r = np.asarray(chain[1].matrix)
        np.testing.assert_allclose(r @ r.T, np.eye(16), atol=1e-4)

    def test_beats_random_rotation_on_hamming(self, correlated):
        from vq_tpu import (
            BinaryIndex,
            RotationTransform,
            TransformedIndex,
            itq_train,
        )

        x, q = correlated
        gt = np.argsort(
            ((x[None] - q[:, None]) ** 2).sum(-1), axis=1
        )[:, :10]

        def recall(ids):
            ids = np.asarray(ids)
            return np.mean([
                len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(q))
            ])

        nbits = 16
        rnd = TransformedIndex(
            [RotationTransform.random(x.shape[1], seed=2, d_out=nbits)],
            BinaryIndex(nbits),
        )
        rnd.add(x)
        itq = TransformedIndex(itq_train(x, nbits, seed=2), BinaryIndex(nbits))
        itq.add(x)
        assert recall(itq.search(q, 10)[0]) > recall(rnd.search(q, 10)[0])

    def test_factory_spec_and_round_trip(self, correlated, tmp_path):
        import vq_tpu
        from vq_tpu import index_factory

        x, q = correlated
        f = index_factory(x.shape[1], "ITQ16,BFlat")
        f.train(x)
        f.add(x)
        i1, _ = f.search(q, 5)
        ld = vq_tpu.load_index(f.index.save(str(tmp_path / "itq")))
        i2, _ = ld.search(q, 5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_bad_params(self, correlated):
        from vq_tpu import itq_train
        from vq_tpu.errors import InvalidParameter

        x, _ = correlated
        with pytest.raises(InvalidParameter):
            itq_train(x, 0)
        with pytest.raises(InvalidParameter):
            itq_train(x, 16, iters=0)

"""RefineIndex: refinement rerank layer (faiss IndexRefine /
IndexRefineFlat / IndexIVFPQR analogs).

Key contract: a flat-f32 refiner over a PQ base must EXACTLY reproduce
the keep_corpus rerank path (same candidates, same exact scoring); the
lossy refiners (bf16 / SQ8 / residual PQ) must lift recall over the bare
base and never raise it above the exact ceiling.
"""

import numpy as np
import pytest

import vq_tpu
from vq_tpu import (
    BatchPipeline,
    BinaryIndex,
    IVFPQIndex,
    PQIndex,
    ProductQuantizer,
    RefineIndex,
    RQIndex,
    ResidualQuantizer,
    SQIndex,
    index_factory,
)
from vq_tpu.errors import (
    DimensionMismatch,
    EmptyInput,
    InvalidData,
    InvalidParameter,
)

D, K = 24, 10


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 3.0, (12, D)).astype(np.float32)
    which = rng.integers(0, 12, 2400)
    x = (centers[which] + rng.normal(0, 0.3, (2400, D))).astype(np.float32)
    q = (centers[rng.integers(0, 12, 16)]
         + rng.normal(0, 0.3, (16, D))).astype(np.float32)
    return x, q


def _gt(x, q, k=K):
    return np.argsort(
        ((x[None, :, :] - q[:, None, :]) ** 2).sum(-1), axis=1
    )[:, :k]


def _recall(ids, gt):
    ids = np.asarray(ids)
    return np.mean(
        [len(set(ids[i]) & set(gt[i])) / gt.shape[1]
         for i in range(len(gt))]
    )


def _pq(x, seed=1):
    return ProductQuantizer(x, 4, 16, max_iters=4, seed=seed)


class TestFlatRefiner:
    def test_matches_keep_corpus_rerank_exactly(self, data):
        x, q = data
        cbs = _pq(x).codebooks
        base = PQIndex(ProductQuantizer(codebooks=cbs))
        ref = RefineIndex(base, "flat")
        ref.add(x)
        kept = PQIndex(ProductQuantizer(codebooks=cbs), keep_corpus=True)
        kept.add(x)
        i_r, d_r = ref.search(q, K, k_factor=4)
        i_k, d_k = kept.search(q, K, rerank=4 * K)
        np.testing.assert_array_equal(np.asarray(i_r), np.asarray(i_k))
        np.testing.assert_allclose(
            np.asarray(d_r), np.asarray(d_k), atol=1e-4
        )

    def test_bf16_near_exact(self, data):
        x, q = data
        base = PQIndex(ProductQuantizer(codebooks=_pq(x).codebooks))
        ref = RefineIndex(base, "flat", store_dtype="bfloat16")
        ref.add(x)
        gt = _gt(x, q)
        i_b, _ = base.search(q, K)
        i_r, _ = ref.search(q, K, k_factor=8)
        assert _recall(i_r, gt) > _recall(i_b, gt)
        assert ref.code_bytes_per_vector == 2 * D

    def test_binary_base(self, data):
        x, q = data
        ref = RefineIndex(BinaryIndex(D), "flat")
        ref.add(x)
        gt = _gt(x, q)
        ids, d = ref.search(q, K, k_factor=8)
        assert _recall(ids, gt) > 0.5
        assert np.all(np.diff(np.asarray(d), axis=1) >= -1e-6)


class TestSQ8Refiner:
    def test_improves_base_recall(self, data):
        x, q = data
        base = PQIndex(ProductQuantizer(codebooks=_pq(x).codebooks))
        ref = RefineIndex(base, "sq8")
        ref.add(x)
        gt = _gt(x, q)
        i_b, _ = base.search(q, K)
        i_r, _ = ref.search(q, K, k_factor=8)
        assert _recall(i_r, gt) > _recall(i_b, gt)
        assert ref.code_bytes_per_vector == D

    def test_explicit_train_data(self, data):
        x, q = data
        base = PQIndex(ProductQuantizer(codebooks=_pq(x).codebooks))
        ref = RefineIndex(base, "sq8", sq_train_data=x[:500])
        assert ref.sq is not None
        ref.add(x)
        ids, _ = ref.search(q, K, k_factor=4)
        assert ids.shape == (len(q), K)


class TestResidualPQRefiner:
    def test_ivfpqr_improves_recall_and_recon(self, data):
        x, q = data
        base = IVFPQIndex.train(x, 8, 4, 16, max_iters=4, seed=2)
        ref = RefineIndex.train_pq(base, x, 8, 16, max_iters=4, seed=3)
        ref.add(x)
        gt = _gt(x, q)
        i_b, _ = base.search(q, K, nprobe=4)
        i_r, _ = ref.search(q, K, k_factor=8, nprobe=4)
        assert _recall(i_r, gt) >= _recall(i_b, gt)
        ids = np.arange(200)
        eb = float(((np.asarray(base.reconstruct(ids)) - x[:200]) ** 2).sum())
        er = float(((np.asarray(ref.reconstruct(ids)) - x[:200]) ** 2).sum())
        assert er < eb  # refined reconstruction is strictly better

    def test_pq_base_residual_refine(self, data):
        x, q = data
        base = PQIndex(ProductQuantizer(codebooks=_pq(x).codebooks))
        ref = RefineIndex.train_pq(base, x, 4, 16, max_iters=4, seed=4)
        ref.add(x)
        gt = _gt(x, q)
        i_b, _ = base.search(q, K)
        i_r, _ = ref.search(q, K, k_factor=8)
        assert _recall(i_r, gt) >= _recall(i_b, gt)

    def test_rq_and_sq_bases_supported(self, data):
        x, q = data
        rq_base = RQIndex(ResidualQuantizer(x, 2, 16, max_iters=3, seed=5))
        ref = RefineIndex.train_pq(rq_base, x, 4, 16, max_iters=3, seed=6)
        ref.add(x)
        ids, _ = ref.search(q, K, k_factor=4)
        assert ids.shape == (len(q), K)
        from vq_tpu import PerDimScalarQuantizer

        sq_base = SQIndex(PerDimScalarQuantizer.from_data(x))
        ref2 = RefineIndex.train_pq(sq_base, x, 4, 16, max_iters=3, seed=7)
        ref2.add(x)
        ids2, _ = ref2.search(q, K, k_factor=4)
        assert ids2.shape == (len(q), K)

    def test_residual_needs_reconstruct_core(self, data):
        x, _ = data
        pq = ProductQuantizer(codebooks=_pq(x).codebooks)
        with pytest.raises(InvalidParameter):
            RefineIndex(BinaryIndex(D), pq)


class TestDotMetric:
    def test_descending_scores_and_exact_rerank(self, data):
        x, q = data
        base = IVFPQIndex.train(x, 8, 4, 16, max_iters=4, seed=8,
                                metric="dot")
        ref = RefineIndex(base, "flat")
        ref.add(x)
        ids, d = ref.search(q, K, k_factor=8, nprobe=8)
        d = np.asarray(d)
        assert np.all(np.diff(d, axis=1) <= 1e-5)  # descending
        # flat-f32 refine scores are EXACT inner products
        top = np.asarray(ids)[:, 0]
        expect = np.sum(x[top] * q, axis=-1)
        np.testing.assert_allclose(d[:, 0], expect, rtol=1e-5)


class TestContract:
    def test_prefilled_base_rejected(self, data):
        x, _ = data
        base = PQIndex(ProductQuantizer(codebooks=_pq(x).codebooks))
        base.add(x)
        with pytest.raises(InvalidData):
            RefineIndex(base, "flat")

    def test_out_of_sync_codes(self, data):
        x, q = data
        base = PQIndex(ProductQuantizer(codebooks=_pq(x).codebooks))
        ref = RefineIndex(base, "flat")
        ref.add(x[:100])
        base.add(x[100:200])  # bypass the wrapper
        with pytest.raises(InvalidData):
            ref.search(q, K)

    def test_empty_raises(self, data):
        x, q = data
        ref = RefineIndex(
            PQIndex(ProductQuantizer(codebooks=_pq(x).codebooks)), "flat"
        )
        with pytest.raises(EmptyInput):
            ref.search(q, K)

    def test_dim_mismatch(self, data):
        x, q = data
        ref = RefineIndex(BinaryIndex(D), "flat")
        ref.add(x)
        with pytest.raises(DimensionMismatch):
            ref.search(q[:, :-1], K)

    def test_bad_k_factor(self, data):
        x, q = data
        ref = RefineIndex(BinaryIndex(D), "flat")
        ref.add(x)
        with pytest.raises(InvalidParameter):
            ref.search(q, K, k_factor=0.5)

    def test_pool_smaller_than_k_pads(self, data):
        x, q = data
        ref = RefineIndex(BinaryIndex(D), "flat")
        ref.add(x[:4])
        ids, d = ref.search(q, 50)
        assert ids.shape == (len(q), 50)
        assert int((np.asarray(ids) == -1).sum()) > 0
        assert np.isinf(np.asarray(d)).any()

    def test_remove_ids_keeps_alignment(self, data):
        x, q = data
        base = PQIndex(ProductQuantizer(codebooks=_pq(x).codebooks))
        ref = RefineIndex(base, "flat")
        ref.add(x[:200])
        removed = ref.remove_ids([0, 5, 7])
        assert removed == 3
        assert ref.ntotal == 197
        # position 0 now holds the old row 1
        np.testing.assert_allclose(
            np.asarray(ref.reconstruct([0])), x[1:2], atol=1e-6
        )
        ids, _ = ref.search(q, K, k_factor=4)
        assert ids.shape == (len(q), K)

    def test_merge_from(self, data):
        x, _ = data
        cbs = _pq(x).codebooks
        a = RefineIndex(PQIndex(ProductQuantizer(codebooks=cbs)), "flat")
        b = RefineIndex(PQIndex(ProductQuantizer(codebooks=cbs)), "flat")
        a.add(x[:300])
        b.add(x[300:500])
        moved = a.merge_from(b)
        assert moved == 200 and a.ntotal == 500 and b.ntotal == 0
        np.testing.assert_allclose(
            np.asarray(a.reconstruct([300])), x[300:301], atol=1e-6
        )

    def test_merge_unfitted_sq8_adopts_quantizer(self, data):
        # regression: an unfitted-sq8 self absorbed a fitted other's
        # codes WITHOUT its quantizer -> crash (or wrong ranges later)
        x, q = data
        cbs = _pq(x).codebooks
        a = RefineIndex(PQIndex(ProductQuantizer(codebooks=cbs)), "sq8")
        b = RefineIndex(PQIndex(ProductQuantizer(codebooks=cbs)), "sq8")
        b.add(x[:300])
        a.merge_from(b)
        assert a.sq is not None
        ids, _ = a.search(q, K, k_factor=4)
        assert ids.shape == (len(q), K)
        np.testing.assert_allclose(
            np.asarray(a.reconstruct([0])),
            np.asarray(a.sq.dequantize(a.sq.quantize(x[:1]))),
            atol=1e-6,
        )

    def test_merge_kind_mismatch(self, data):
        x, _ = data
        cbs = _pq(x).codebooks
        a = RefineIndex(PQIndex(ProductQuantizer(codebooks=cbs)), "flat")
        b = RefineIndex(PQIndex(ProductQuantizer(codebooks=cbs)), "sq8")
        a.add(x[:50])
        b.add(x[:50])
        with pytest.raises(InvalidData):
            a.merge_from(b)


class TestPersistence:
    @pytest.mark.parametrize(
        "refiner", ["flat", "flat16", "sq8", "pq"]
    )
    def test_round_trip(self, data, tmp_path, refiner):
        x, q = data
        base = IVFPQIndex.train(x, 8, 4, 16, max_iters=4, seed=9)
        if refiner == "pq":
            ref = RefineIndex.train_pq(base, x, 4, 16, max_iters=3, seed=10)
        elif refiner == "flat16":
            # regression: bf16 codes need the uint16 npz view on both ends
            ref = RefineIndex(base, "flat", store_dtype="bfloat16")
        else:
            ref = RefineIndex(base, refiner)
        ref.add(x)
        i1, d1 = ref.search(q, K, k_factor=4, nprobe=4)
        p = ref.save(str(tmp_path / "r"))
        ld = vq_tpu.load_index(p)
        assert isinstance(ld, RefineIndex)
        i2, d2 = ld.search(q, K, k_factor=4, nprobe=4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(
            np.asarray(d1), np.asarray(d2), atol=1e-5
        )


class TestServing:
    def test_pipeline_parity(self, data):
        x, q = data
        base = IVFPQIndex.train(x, 8, 4, 16, max_iters=4, seed=11)
        ref = RefineIndex(base, "sq8")
        ref.add(x)
        pipe = BatchPipeline(ref, k=K, k_factor=4, nprobe=4)
        qs = np.stack([q, q + 0.01, q - 0.01])
        ids_p, vals_p = pipe.search(qs)
        for t in range(3):
            ids_s, vals_s = ref.search(qs[t], K, k_factor=4, nprobe=4)
            np.testing.assert_array_equal(
                np.asarray(ids_p[t]), np.asarray(ids_s)
            )
            np.testing.assert_allclose(
                np.asarray(vals_p[t]), np.asarray(vals_s), atol=1e-5
            )


class TestFactory:
    @pytest.mark.parametrize("spec,kw", [
        ("IVF16,PQ4+8", {"nprobe": 8}),
        ("IVF16,PQ4,RSQ8", {"nprobe": 8}),
        ("IVF16,Flat,RFlat16", {"nprobe": 8}),
        ("PQ4,RFlat", {}),
        ("BFlat,RFlat", {}),
    ])
    def test_specs_build_and_beat_base(self, data, spec, kw):
        x, q = data
        f = index_factory(D, spec)
        if not f.is_trained:
            f.train(x, max_iters=4)
        f.add(x)
        ids, _ = f.search(q, K, k_factor=8, **kw)
        gt = _gt(x, q)
        assert _recall(ids, gt) > 0.3

    def test_bad_refine_spec(self):
        with pytest.raises(InvalidParameter):
            index_factory(D, "IVF16,PQ4+x")

    def test_ivfpqr_dot(self, data):
        x, q = data
        f = index_factory(D, "IVF16,PQ4+8", metric="dot")
        f.train(x, max_iters=4)
        f.add(x)
        ids, d = f.search(q, K, k_factor=8, nprobe=16)
        d = np.asarray(d)
        assert np.all(np.diff(d, axis=1) <= 1e-5)

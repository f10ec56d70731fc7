"""ProductQuantizer tests (reference: src/pq.rs tests + pyvq/tests/test_pq.py)."""

import numpy as np
import pytest

from vq_tpu import (
    DimensionMismatch,
    Distance,
    EmptyInput,
    InvalidParameter,
    Metric,
    ProductQuantizer,
)


@pytest.fixture(scope="module")
def train_data():
    rng = np.random.default_rng(42)
    return rng.random((200, 16), dtype=np.float32)


@pytest.fixture(scope="module")
def pq(train_data):
    return ProductQuantizer(train_data, num_subspaces=4, num_centroids=8,
                            max_iters=15, seed=42)


class TestBasics:
    def test_getters(self, pq):
        # reference: src/pq.rs:143-162
        assert pq.num_subspaces == 4
        assert pq.sub_dim == 4
        assert pq.dim == 16
        assert pq.num_centroids == 8
        assert pq.distance_metric == "euclidean"  # default (pyvq/src/pq.rs:73-75)
        assert pq.codebooks.shape == (4, 8, 4)

    def test_quantize_reference_shape_and_dtype(self, pq, train_data):
        # quantize returns f16 centroid values, same length as input
        # (reference: src/pq.rs:167-199)
        q = np.asarray(pq.quantize(train_data[0]))
        assert q.shape == (16,)
        assert q.dtype == np.float16

    def test_quantized_values_are_codebook_entries(self, pq, train_data):
        q = np.asarray(pq.quantize(train_data[0])).astype(np.float32)
        cb = np.asarray(pq.codebooks)
        for i in range(pq.num_subspaces):
            sub = q[i * 4 : (i + 1) * 4]
            match = np.abs(cb[i].astype(np.float16).astype(np.float32) - sub).max(axis=1)
            assert match.min() < 1e-6

    def test_dequantize_roundtrip(self, pq, train_data):
        q = pq.quantize(train_data[:5])
        rec = np.asarray(pq.dequantize(q))
        assert rec.shape == (5, 16)
        assert rec.dtype == np.float32

    def test_encode_decode_codes(self, pq, train_data):
        codes = np.asarray(pq.encode(train_data[:10]))
        assert codes.shape == (10, 4)
        assert codes.dtype == np.uint8  # k=8 fits u8
        rec = np.asarray(pq.decode(codes))
        assert rec.shape == (10, 16)

    def test_encode_is_nearest_per_subspace(self, pq, train_data):
        x = train_data[:20]
        codes = np.asarray(pq.encode(x))
        cb = np.asarray(pq.codebooks)
        for i in range(20):
            for m in range(4):
                sub = x[i, m * 4 : (m + 1) * 4]
                d = np.linalg.norm(cb[m] - sub, axis=1)
                assert codes[i, m] == int(np.argmin(d))

    def test_reconstruction_reduces_error(self, pq, train_data):
        rec = np.asarray(pq.decode(pq.encode(train_data)))
        mse = float(((rec - train_data) ** 2).mean())
        baseline = float(((train_data - train_data.mean(0)) ** 2).mean())
        assert mse < baseline  # better than predicting the mean

    def test_deterministic(self, train_data):
        a = ProductQuantizer(train_data, 4, 8, seed=1)
        b = ProductQuantizer(train_data, 4, 8, seed=1)
        np.testing.assert_array_equal(
            np.asarray(a.codebooks), np.asarray(b.codebooks)
        )

    def test_from_codebooks(self, pq, train_data):
        clone = ProductQuantizer(codebooks=pq.codebooks, distance="euclidean")
        np.testing.assert_array_equal(
            np.asarray(clone.encode(train_data[:5])),
            np.asarray(pq.encode(train_data[:5])),
        )

    @pytest.mark.parametrize("metric", list(Metric))
    def test_all_metrics_encode(self, train_data, metric):
        # reference: all 4 distances x PQ (tests/integration_tests.rs:246-264)
        pq = ProductQuantizer(train_data, 4, 4, max_iters=5, distance=metric)
        codes = np.asarray(pq.encode(train_data[:8]))
        assert codes.shape == (8, 4)
        assert (codes < 4).all()

    def test_distance_object_accepted(self, train_data):
        pq = ProductQuantizer(train_data, 2, 4, distance=Distance.cosine())
        assert pq.distance_metric == "cosine"


class TestValidation:
    def test_empty_training(self):
        # reference: src/pq.rs:91-93
        with pytest.raises(EmptyInput):
            ProductQuantizer(np.zeros((0, 8), dtype=np.float32), 2, 2)

    def test_dim_not_divisible(self):
        # reference: src/pq.rs:112-117
        with pytest.raises(InvalidParameter):
            ProductQuantizer(np.ones((10, 3), dtype=np.float32), 2, 2)

    def test_m_greater_than_dim(self):
        # reference: src/pq.rs:106-111
        with pytest.raises(InvalidParameter):
            ProductQuantizer(np.ones((10, 2), dtype=np.float32), 4, 2)

    def test_quantize_wrong_dim(self, pq):
        # reference: src/pq.rs:168-174
        with pytest.raises(DimensionMismatch):
            pq.quantize(np.ones(7, dtype=np.float32))

    def test_dequantize_wrong_dim(self, pq):
        with pytest.raises(DimensionMismatch):
            pq.dequantize(np.ones(7, dtype=np.float16))

    def test_ragged_training_rejected(self):
        with pytest.raises(DimensionMismatch):
            ProductQuantizer([[1.0, 2.0], [1.0, 2.0, 3.0]], 1, 1)


class TestADC:
    def test_adc_matches_decoded_distances(self, pq, train_data):
        queries = train_data[:5]
        codes = pq.encode(train_data[:50])
        adc = np.asarray(pq.adc_distances(queries, codes))
        rec = np.asarray(pq.decode(codes))
        want = np.linalg.norm(
            queries[:, None, :] - rec[None, :, :], axis=-1
        )
        np.testing.assert_allclose(adc, want, rtol=1e-3, atol=1e-3)

    def test_adc_search_topk(self, pq, train_data):
        codes = pq.encode(train_data)
        idx, dist = pq.adc_search(train_data[:3], codes, k=5)
        assert np.asarray(idx).shape == (3, 5)
        d = np.asarray(dist)
        assert (np.diff(d, axis=1) >= -1e-6).all()  # ascending

    def test_adc_cosine(self, train_data):
        pq = ProductQuantizer(train_data, 4, 8, distance="cosine", seed=0)
        queries = train_data[:4]
        codes = pq.encode(train_data[:30])
        adc = np.asarray(pq.adc_distances(queries, codes))
        rec = np.asarray(pq.decode(codes))
        qn = np.linalg.norm(queries, axis=1, keepdims=True)
        rn = np.linalg.norm(rec, axis=1, keepdims=True)
        want = 1 - (queries @ rec.T) / (qn * rn.T)
        want = np.clip(want, 0.0, 1.0)
        np.testing.assert_allclose(adc, want, rtol=1e-3, atol=1e-3)

    def test_adc_manhattan(self, train_data):
        pq = ProductQuantizer(train_data, 4, 8, distance="manhattan", seed=0)
        queries = train_data[:4]
        codes = pq.encode(train_data[:30])
        adc = np.asarray(pq.adc_distances(queries, codes))
        rec = np.asarray(pq.decode(codes))
        want = np.abs(queries[:, None, :] - rec[None, :, :]).sum(-1)
        np.testing.assert_allclose(adc, want, rtol=1e-3, atol=1e-3)


class TestRerank:
    def test_rerank_improves_or_matches_recall(self, rng):
        # Two-stage search: ADC shortlist + exact rerank must dominate
        # plain ADC on ground-truth recall.
        import jax

        from vq_tpu.ops.distance import pairwise

        data = rng.random((4000, 32), dtype=np.float32)
        pq = ProductQuantizer(data, 4, 16, max_iters=5)
        codes = pq.encode(data)
        queries = data[:30]
        d_true = pairwise(queries, data, "euclidean")
        _, truth = jax.lax.top_k(-d_true, 10)
        truth = np.asarray(truth)

        def recall(idx):
            idx = np.asarray(idx)
            return np.mean([
                len(set(r.tolist()) & set(t.tolist())) / 10
                for r, t in zip(idx, truth)
            ])

        idx_adc, _ = pq.adc_search(queries, codes, k=10)
        idx_rr, d_rr = pq.adc_search(
            queries, codes, k=10, rerank=200, corpus=data
        )
        assert recall(idx_rr) >= recall(idx_adc)
        # Reranked distances are exact (match brute-force pairwise for the
        # returned ids) and sorted ascending.
        d_rr = np.asarray(d_rr)
        assert (np.diff(d_rr, axis=1) >= -1e-6).all()
        d_true_np = np.asarray(d_true)
        picked = np.take_along_axis(d_true_np, np.asarray(idx_rr), axis=1)
        # sqrt of the matmul-form's f32 error floor (~2e-6) puts near-
        # zero distances at the ~1.5e-3 scale; tolerance covers that.
        np.testing.assert_allclose(d_rr, picked, rtol=1e-3, atol=2e-3)

    def test_rerank_caps_at_corpus(self, rng):
        data = rng.random((50, 16), dtype=np.float32)
        pq = ProductQuantizer(data, 4, 8, max_iters=2)
        codes = pq.encode(data)
        idx, _ = pq.adc_search(data[:3], codes, k=5, rerank=1000, corpus=data)
        assert np.asarray(idx).shape == (3, 5)


class TestChunkedADCSearch:
    @pytest.mark.parametrize("metric", ["squared_euclidean", "euclidean", "cosine"])
    def test_chunked_matches_dense(self, rng, metric):
        # Small chunk forces the blockwise scan; results must match the
        # dense [Q, n] path exactly (same top-k, ascending).
        data = rng.random((1200, 16), dtype=np.float32)
        q = ProductQuantizer(data, 4, 16, max_iters=3, seed=0,
                             distance=metric)
        codes = q.encode(data)
        queries = data[:7]
        ids_d, dist_d = q.adc_search(queries, codes, k=9, chunk=10**9)
        ids_c, dist_c = q.adc_search(queries, codes, k=9, chunk=256)
        np.testing.assert_allclose(
            np.asarray(dist_c), np.asarray(dist_d), rtol=1e-5, atol=1e-6
        )
        # ids may differ only where distances tie; check by distance parity
        same = np.asarray(ids_c) == np.asarray(ids_d)
        tied = np.isclose(np.asarray(dist_c), np.asarray(dist_d), atol=1e-6)
        assert (same | tied).all()

    def test_chunked_with_rerank(self):
        # Local fixed rng: the session rng's state depends on test order,
        # and this assertion (self-retrieval through a finite ADC
        # shortlist) is data-sensitive.
        rng = np.random.default_rng(1234)
        data = rng.random((900, 16), dtype=np.float32)
        q = ProductQuantizer(data, 4, 16, max_iters=8, seed=0)
        codes = q.encode(data)
        ids, dist = q.adc_search(
            data[:5], codes, k=3, rerank=300, corpus=data, chunk=128
        )
        # exact rerank: query finds itself first with ~0 distance
        assert (np.asarray(ids)[:, 0] == np.arange(5)).all()
        assert float(np.asarray(dist)[:, 0].max()) < 1e-3


class TestEncodePrecisionLadder:
    """pq_encode(precision=...): the m-packed bf16 fast modes (round 4).

    On CPU every precision computes in f32, so all modes must produce
    IDENTICAL codes — this pins the m-packed layout (block-diagonal W +
    per-subspace argmin) against the reference path; the bf16 flip rates
    on TPU are characterized in docs/performance.md."""

    def test_high_modes_match_reference_on_cpu(self, rng):
        # HIGH is full f32 on CPU -> the m-packed layout itself must be
        # exact (same argmin, lowest-index ties, padding path at odd n).
        from vq_tpu.models.pq import pq_encode, pq_train

        x = rng.random((700, 32), dtype=np.float32)  # odd n: padding path
        cb = pq_train(x, 4, 16, max_iters=3, seed=1)
        ref = np.asarray(pq_encode(x, cb))
        for precision in ("high", "bf16x3"):
            got = np.asarray(pq_encode(x, cb, precision=precision))
            np.testing.assert_array_equal(got, ref, err_msg=precision)

    def test_default_mode_flips_near_ties_only(self, rng):
        # "default" REALLY computes in bf16 (explicit cast, identical
        # contract on every backend): codes may flip, but only where the
        # exact score gap between chosen and reference centroid is tiny.
        from vq_tpu.models.pq import pq_encode, pq_train

        x = rng.random((700, 32), dtype=np.float32)
        cb = np.asarray(pq_train(x, 4, 16, max_iters=3, seed=1))
        ref = np.asarray(pq_encode(x, cb))
        got = np.asarray(pq_encode(x, cb, precision="default"))
        match = (got == ref).mean()
        assert match > 0.97, match
        xs = x.reshape(700, 4, 8)
        for n_i, m_i in zip(*np.nonzero(got != ref)):
            d_ref = ((xs[n_i, m_i] - cb[m_i, ref[n_i, m_i]]) ** 2).sum()
            d_got = ((xs[n_i, m_i] - cb[m_i, got[n_i, m_i]]) ** 2).sum()
            scale = ((xs[n_i, m_i] ** 2).sum() + 1e-9)
            assert abs(d_got - d_ref) / scale < 0.02, (n_i, m_i)

    def test_quantizer_encode_precision_passthrough(self, rng):
        import vq_tpu

        x = rng.random((300, 16), dtype=np.float32)
        pq = vq_tpu.ProductQuantizer(x, 2, 8, max_iters=2, seed=3)
        got = np.asarray(pq.encode(x, precision="high"))
        np.testing.assert_array_equal(got, np.asarray(pq.encode(x)))

    def test_bad_precision_rejected(self, rng):
        from vq_tpu.errors import InvalidParameter
        from vq_tpu.models.pq import pq_encode, pq_train

        x = rng.random((64, 8), dtype=np.float32)
        cb = pq_train(x, 2, 4, max_iters=1, seed=0)
        with pytest.raises(InvalidParameter):
            pq_encode(x, cb, precision="bf16x9")

    def test_non_l2_metric_falls_back(self, rng):
        from vq_tpu.models.pq import pq_encode, pq_train

        x = rng.random((64, 8), dtype=np.float32)
        cb = pq_train(x, 2, 4, max_iters=1, seed=0)
        got = pq_encode(x, cb, metric="manhattan", precision="default")
        ref = pq_encode(x, cb, metric="manhattan")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_decode_onehot_path_bit_exact(rng):
    """The one-hot HIGHEST decode (TPU fast path) must reproduce the
    gathered centroid values BIT-exactly — the bf16x6 split of an f32 is
    lossless and one-hot products are exact selections."""
    from vq_tpu.models.pq import _pq_decode_jit, pq_train

    x = rng.random((400, 32), dtype=np.float32)
    cb = pq_train(x, 4, 16, max_iters=2, seed=1)
    codes = np.random.default_rng(2).integers(0, 16, (1000, 4)).astype(
        np.int32
    )
    import jax.numpy as jnp

    a = np.asarray(_pq_decode_jit(jnp.asarray(codes), cb, use_onehot=False))
    b = np.asarray(_pq_decode_jit(jnp.asarray(codes), cb, use_onehot=True))
    np.testing.assert_array_equal(a, b)

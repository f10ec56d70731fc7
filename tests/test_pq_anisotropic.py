"""Anisotropic (score-aware) PQ — ScaNN-style MIPS product quantization."""

import numpy as np
import pytest

from vq_tpu.errors import DimensionMismatch, InvalidParameter
from vq_tpu.models.pq import ProductQuantizer, pq_decode, pq_encode, pq_train
from vq_tpu.models.pq_anisotropic import (
    AnisotropicProductQuantizer,
    anisotropic_pq_loss,
    mips_adc_search,
    pq_encode_anisotropic,
    pq_refine_anisotropic,
    pq_train_anisotropic,
)


@pytest.fixture(scope="module")
def mips_data():
    # Directionally clustered points with varied norms, 32-D, m=4 subspaces.
    rng = np.random.default_rng(11)
    dirs = rng.normal(0, 1, (3000, 32)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    norms = rng.uniform(0.5, 2.0, (3000, 1)).astype(np.float32)
    return dirs * norms


def test_eta_one_encode_equals_plain_pq(mips_data):
    """eta=1 collapses the loss to plain L2; coordinate descent must return
    exactly the plain per-subspace argmin codes."""
    cb = pq_train(mips_data, 4, 16, max_iters=5, seed=0)
    plain = np.asarray(pq_encode(mips_data, cb, "euclidean"))
    aniso = np.asarray(pq_encode_anisotropic(mips_data, cb, 1.0, sweeps=3))
    np.testing.assert_array_equal(aniso, plain)


def test_coordinate_descent_lowers_loss(mips_data):
    """At fixed codebooks, each sweep is an exact blockwise minimizer —
    the anisotropic loss of the swept codes must not exceed the plain-init
    loss, and must strictly improve on this data."""
    cb = pq_train(mips_data, 4, 16, max_iters=5, seed=0)
    eta = 5.0
    init = pq_encode(mips_data, cb, "euclidean")
    l0 = anisotropic_pq_loss(mips_data, cb, init, eta)
    swept = pq_encode_anisotropic(mips_data, cb, eta, sweeps=2)
    l1 = anisotropic_pq_loss(mips_data, cb, swept, eta)
    assert l1 < l0 * 0.999


def test_refine_loss_monotone(mips_data):
    """Alternating exact encode/update passes: total loss non-increasing
    in the number of refinement iterations."""
    cb0 = pq_train(mips_data, 4, 16, max_iters=5, seed=1)
    losses = [
        float(
            pq_refine_anisotropic(mips_data, cb0, eta=4.0, iters=i)[2]
        )
        for i in (1, 3, 6)
    ]
    assert losses[1] <= losses[0] * (1 + 1e-5)
    assert losses[2] <= losses[1] * (1 + 1e-5)


def test_lower_top_score_error_than_plain_pq(mips_data):
    """The headline claim: lower squared SCORE error on each query's true
    top-10 inner-product neighbors than plain PQ at equal (m, k)."""
    rng = np.random.default_rng(7)
    queries = rng.normal(0, 1, (200, 32)).astype(np.float32)
    true_scores = queries @ mips_data.T
    top = np.argsort(-true_scores, axis=1)[:, :10]

    def top_score_mse(cb, codes):
        recon = np.asarray(pq_decode(codes, cb))
        err = true_scores - queries @ recon.T
        return float(np.mean(np.take_along_axis(err, top, axis=1) ** 2))

    m, k = 4, 32
    cb_plain = pq_train(mips_data, m, k, max_iters=10, seed=0)
    codes_plain = pq_encode(mips_data, cb_plain, "euclidean")
    cb_a, codes_a, _ = pq_refine_anisotropic(
        mips_data, cb_plain, eta=6.0, iters=6, sweeps=2
    )
    assert top_score_mse(cb_a, codes_a) < 0.9 * top_score_mse(
        cb_plain, codes_plain
    )


def test_refine_deterministic(mips_data):
    cb0 = pq_train(mips_data, 4, 16, max_iters=4, seed=2)
    a = pq_refine_anisotropic(mips_data, cb0, eta=3.0, iters=2)
    b = pq_refine_anisotropic(mips_data, cb0, eta=3.0, iters=2)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_mips_search_matches_bruteforce(mips_data):
    pq = AnisotropicProductQuantizer(
        mips_data, 4, 32, max_iters=6, seed=0, eta=4.0, refine_iters=3
    )
    codes = pq.encode(mips_data)
    rng = np.random.default_rng(3)
    queries = rng.normal(0, 1, (20, 32)).astype(np.float32)
    ids, scores = pq.mips_search(queries, codes, k=5)
    recon = np.asarray(pq.decode(codes))
    brute = queries @ recon.T  # [Q, n]
    # Scores must equal the decoded dot products of the returned ids, and
    # match the true top-k score values (ids may differ only on exact ties).
    picked = np.take_along_axis(brute, np.asarray(ids), axis=1)
    np.testing.assert_allclose(np.asarray(scores), picked, rtol=1e-5,
                               atol=1e-4)
    best = -np.sort(-brute, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(scores), best, rtol=1e-5,
                               atol=1e-4)


def test_mips_search_chunked_matches_single(mips_data):
    """Blockwise top-k merge returns the same results as one big chunk."""
    cb = pq_train_anisotropic(
        mips_data, 4, 16, max_iters=4, seed=0, eta=3.0, refine_iters=2
    )
    codes = pq_encode_anisotropic(mips_data, cb, 3.0)
    rng = np.random.default_rng(4)
    q = rng.normal(0, 1, (8, 32)).astype(np.float32)
    i1, s1 = mips_adc_search(q, cb, codes, k=7, chunk=500)
    i2, s2 = mips_adc_search(q, cb, codes, k=7, chunk=1 << 20)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_short_corpus_pads_with_sentinels(mips_data):
    cb = pq_train(mips_data, 4, 8, max_iters=3, seed=0)
    codes = pq_encode(mips_data[:3], cb, "euclidean")
    ids, scores = mips_adc_search(mips_data[:2], cb, codes, k=5)
    assert ids.shape == (2, 5)
    assert np.all(np.asarray(ids)[:, 3:] == -1)
    assert np.all(np.asarray(scores)[:, 3:] == -np.inf)


def test_class_encode_dtype_and_roundtrip(mips_data):
    pq = AnisotropicProductQuantizer(
        mips_data, 4, 16, max_iters=4, seed=0, eta=2.0, refine_iters=2
    )
    codes = pq.encode(mips_data[:50])
    assert codes.dtype == np.uint8 and codes.shape == (50, 4)
    recon = pq.decode(codes)
    assert recon.shape == (50, 32)
    one = pq.encode(mips_data[0])
    assert one.shape == (4,)
    assert "eta" in repr(pq)


def test_eta_validation(mips_data):
    cb = pq_train(mips_data, 4, 8, max_iters=2, seed=0)
    with pytest.raises(InvalidParameter):
        pq_encode_anisotropic(mips_data, cb, 0.5)
    with pytest.raises(InvalidParameter):
        pq_refine_anisotropic(mips_data, cb, eta=0.0)
    with pytest.raises(DimensionMismatch):
        pq_encode_anisotropic(mips_data[:, :30], cb, 2.0)


def test_save_load_roundtrip(tmp_path, mips_data):
    from vq_tpu.utils.serialize import load, save

    pq = AnisotropicProductQuantizer(
        mips_data, 4, 16, max_iters=3, seed=0, eta=3.0, refine_iters=2
    )
    path = save(str(tmp_path / "aniso"), pq)
    back = load(path)
    assert isinstance(back, AnisotropicProductQuantizer)
    assert back.eta == pq.eta
    np.testing.assert_array_equal(
        np.asarray(back.codebooks), np.asarray(pq.codebooks)
    )
    np.testing.assert_array_equal(
        np.asarray(back.encode(mips_data[:20])),
        np.asarray(pq.encode(mips_data[:20])),
    )


def test_zero_norm_rows_fall_back_to_l2(mips_data):
    cb = pq_train(mips_data, 4, 8, max_iters=3, seed=0)
    x = np.vstack([np.zeros((2, 32), np.float32), mips_data[:4]])
    codes = pq_encode_anisotropic(x, cb, 5.0, sweeps=2)
    plain = pq_encode(x[:2], cb, "euclidean")
    np.testing.assert_array_equal(np.asarray(codes[:2]), np.asarray(plain))

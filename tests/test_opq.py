"""OPQ: rotation orthogonality, MSE dominance over plain PQ on correlated
data, serialization round-trip."""

import numpy as np
import pytest

from vq_tpu import ProductQuantizer
from vq_tpu.models.opq import OPQQuantizer, opq_train


@pytest.fixture(scope="module")
def correlated():
    # Strongly anisotropic data: a random linear mix concentrates variance
    # along arbitrary (non-axis-aligned) directions — the case plain PQ's
    # fixed coordinate split handles worst and OPQ exists for.
    rng = np.random.default_rng(3)
    latent = rng.normal(0, 1, (4000, 8)).astype(np.float32)
    mix = rng.normal(0, 1, (8, 32)).astype(np.float32)
    noise = rng.normal(0, 0.05, (4000, 32)).astype(np.float32)
    return latent @ mix + noise


def mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def test_rotation_is_orthogonal(correlated):
    rot, cb = opq_train(correlated, 4, 16, opq_iters=4, pq_iters=3)
    r = np.asarray(rot)
    np.testing.assert_allclose(r @ r.T, np.eye(32), atol=1e-4)
    assert cb.shape == (4, 16, 8)


def test_opq_beats_pq_on_correlated_data(correlated):
    pq = ProductQuantizer(correlated, 4, 16, max_iters=10, seed=0,
                          distance="squared_euclidean")
    opq = OPQQuantizer(correlated, 4, 16, opq_iters=8, pq_iters=3, seed=0)
    mse_pq = mse(correlated, pq.decode(pq.encode(correlated)))
    mse_opq = mse(correlated, opq.decode(opq.encode(correlated)))
    assert mse_opq < mse_pq * 0.95  # strict improvement


def test_roundtrip_shapes(correlated):
    opq = OPQQuantizer(correlated, 4, 16, opq_iters=2, pq_iters=2)
    codes = np.asarray(opq.encode(correlated[:10]))
    assert codes.shape == (10, 4)
    rec = np.asarray(opq.decode(codes))
    assert rec.shape == (10, 32)
    f16 = np.asarray(opq.quantize(correlated[0]))
    assert f16.dtype == np.float16 and f16.shape == (32,)


def test_restore_from_arrays(correlated):
    opq = OPQQuantizer(correlated, 4, 16, opq_iters=2, pq_iters=2)
    clone = OPQQuantizer(
        rotation=np.asarray(opq.rotation),
        codebooks=np.asarray(opq.codebooks),
    )
    np.testing.assert_array_equal(
        np.asarray(opq.encode(correlated[:5])),
        np.asarray(clone.encode(correlated[:5])),
    )


def test_adc_search_rotated_space(correlated):
    opq = OPQQuantizer(correlated, 4, 16, opq_iters=3, pq_iters=3)
    codes = opq.encode(correlated)
    idx, dist = opq.adc_search(correlated[:5], codes, k=3)
    assert np.asarray(idx).shape == (5, 3)
    # with exact rerank, each query finds itself
    idx_rr, _ = opq.adc_search(
        correlated[:5], codes, k=1, rerank=50, corpus=correlated
    )
    np.testing.assert_array_equal(np.asarray(idx_rr)[:, 0], np.arange(5))


def test_serialize_roundtrip(correlated, tmp_path):
    from vq_tpu.utils import load, save

    opq = OPQQuantizer(correlated, 4, 16, opq_iters=2, pq_iters=2)
    p = save(str(tmp_path / "opq"), opq)
    opq2 = load(p)
    assert isinstance(opq2, OPQQuantizer)
    np.testing.assert_array_equal(
        np.asarray(opq.encode(correlated[:5])),
        np.asarray(opq2.encode(correlated[:5])),
    )

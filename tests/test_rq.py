"""Residual quantizer: monotone stage improvement, roundtrips, serialization."""

import numpy as np
import pytest

from vq_tpu.errors import DimensionMismatch, InvalidParameter
from vq_tpu.models.rq import ResidualQuantizer, rq_decode, rq_encode, rq_train


@pytest.fixture(scope="module")
def data(rng):
    return rng.random((2000, 24), dtype=np.float32)


def mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def test_shapes_and_dtypes(data):
    rq = ResidualQuantizer(data, num_stages=4, num_centroids=32, max_iters=5)
    codes = np.asarray(rq.encode(data[:10]))
    assert codes.shape == (10, 4) and codes.dtype == np.uint8
    rec = np.asarray(rq.decode(codes))
    assert rec.shape == (10, 24)
    assert rq.codebooks.shape == (4, 32, 24)


def test_more_stages_reduce_mse(data):
    prev = None
    for stages in (1, 2, 4):
        rq = ResidualQuantizer(data, stages, 32, max_iters=8, seed=0)
        m = mse(data, rq.decode(rq.encode(data)))
        if prev is not None:
            assert m < prev
        prev = prev if prev is not None and m >= prev else m
    assert prev < 0.08  # uniform variance is 1/12 ~ 0.083


def test_rq_beats_pq_same_budget(rng):
    # Correlated data, equal byte budget: 4 RQ stages vs PQ 4x256 (both
    # 4 bytes/vector). RQ's full-d codewords capture cross-dim structure.
    latent = rng.normal(0, 1, (3000, 6)).astype(np.float32)
    mix = rng.normal(0, 1, (6, 24)).astype(np.float32)
    data = latent @ mix + rng.normal(0, 0.05, (3000, 24)).astype(np.float32)
    from vq_tpu import ProductQuantizer

    rq = ResidualQuantizer(data, 4, 256, max_iters=8, seed=1)
    pq = ProductQuantizer(data, 4, 256, max_iters=8, seed=1)
    assert mse(data, rq.decode(rq.encode(data))) < mse(
        data, pq.decode(pq.encode(data))
    )


def test_encode_is_greedy_residual(data):
    rq = ResidualQuantizer(data, 2, 8, max_iters=5, seed=2)
    cbs = np.asarray(rq.codebooks)
    x = np.asarray(data[:5])
    codes = np.asarray(rq.encode(x))
    for i in range(5):
        r = x[i]
        for s in range(2):
            d = np.sum((cbs[s] - r) ** 2, axis=1)
            assert codes[i, s] == int(np.argmin(d))
            r = r - cbs[s][codes[i, s]]


def test_determinism(data):
    a = ResidualQuantizer(data, 3, 16, seed=5)
    b = ResidualQuantizer(data, 3, 16, seed=5)
    np.testing.assert_array_equal(
        np.asarray(a.codebooks), np.asarray(b.codebooks)
    )


def test_serialize_roundtrip(data, tmp_path):
    from vq_tpu.utils import load, save

    rq = ResidualQuantizer(data, 3, 16, max_iters=3)
    p = save(str(tmp_path / "rq"), rq)
    rq2 = load(p)
    assert isinstance(rq2, ResidualQuantizer)
    np.testing.assert_array_equal(
        np.asarray(rq.encode(data[:5])), np.asarray(rq2.encode(data[:5]))
    )


def test_validation(data):
    with pytest.raises(InvalidParameter):
        rq_train(data, 0, 4)
    rq = ResidualQuantizer(data, 2, 8, max_iters=2)
    with pytest.raises(DimensionMismatch):
        rq.encode(np.zeros((2, 10), np.float32))
    with pytest.raises(DimensionMismatch):
        rq_decode(np.zeros((2, 3), np.int32), rq.codebooks)


class TestBeamSearch:
    def test_beam1_equals_greedy(self, data):
        from vq_tpu.models.rq import _rq_encode_beam_jit

        rq = ResidualQuantizer(data, 3, 16, max_iters=5, seed=7)
        greedy = np.asarray(rq.encode(data[:200]))
        # the beam kernel itself at width 1 must reproduce greedy exactly
        beam1 = np.asarray(
            _rq_encode_beam_jit(
                np.asarray(data[:200]), rq.codebooks, 1, 200
            )
        )
        np.testing.assert_array_equal(greedy, beam1)

    def test_beam_improves_mse(self, data):
        rq = ResidualQuantizer(data, 4, 16, max_iters=8, seed=7)
        x = data[:500]
        mse_greedy = float(np.mean(
            (np.asarray(rq.decode(rq.encode(x))) - x) ** 2
        ))
        codes_b = rq.encode(x, beam=8)
        mse_beam = float(np.mean(
            (np.asarray(rq.decode(codes_b)) - x) ** 2
        ))
        assert mse_beam <= mse_greedy
        assert mse_beam < mse_greedy * 0.999  # strictly better somewhere

    def test_beam_codes_in_range(self, data):
        rq = ResidualQuantizer(data, 3, 16, max_iters=3, seed=1)
        codes = np.asarray(rq.encode(data[:50], beam=4))
        assert codes.shape == (50, 3)
        assert codes.max() < 16


class TestJointRefinement:
    def test_solve_codebooks_exact_for_fixed_codes(self, rng):
        # With fixed codes, the normal-equation solve is the global optimum:
        # MSE must not increase vs the current codebooks.
        from vq_tpu.models.rq import (
            _rq_solve_codebooks_jit,
            rq_decode,
            rq_encode,
            rq_train,
        )

        data = rng.normal(0, 1, (600, 16)).astype(np.float32)
        cbs = rq_train(data, 3, 8, max_iters=5, seed=0)
        codes = rq_encode(data, cbs)
        before = float(np.mean((np.asarray(rq_decode(codes, cbs)) - data) ** 2))
        import jax.numpy as jnp

        cbs2 = _rq_solve_codebooks_jit(
            jnp.asarray(data), jnp.asarray(codes).astype(jnp.int32), 8, 256
        )
        after = float(np.mean((np.asarray(rq_decode(codes, cbs2)) - data) ** 2))
        assert after <= before * (1 + 1e-4)

    def test_joint_refinement_lowers_mse(self, rng):
        from vq_tpu.models.rq import rq_decode, rq_encode, rq_refine_joint, rq_train

        # Correlated data: stage interactions matter, joint update wins.
        basis = rng.normal(0, 1, (4, 24)).astype(np.float32)
        coef = rng.normal(0, 1, (800, 4)).astype(np.float32)
        data = (coef @ basis + 0.05 * rng.normal(0, 1, (800, 24))).astype(
            np.float32
        )
        cbs = rq_train(data, 4, 8, max_iters=8, seed=1)
        mse0 = float(
            np.mean((np.asarray(rq_decode(rq_encode(data, cbs, beam=4), cbs))
                     - data) ** 2)
        )
        cbs_j = rq_refine_joint(data, cbs, iters=3, beam=4)
        mse_j = float(
            np.mean((np.asarray(rq_decode(rq_encode(data, cbs_j, beam=4), cbs_j))
                     - data) ** 2)
        )
        assert mse_j < mse0 * 0.98  # at least a 2% improvement

    def test_ctor_joint_iters(self, rng):
        from vq_tpu.models.rq import ResidualQuantizer

        # Correlated data (where stage interactions matter), and evaluate
        # with the same beam the refinement optimized for.
        basis = rng.normal(0, 1, (3, 12)).astype(np.float32)
        coef = rng.normal(0, 1, (500, 3)).astype(np.float32)
        data = (coef @ basis).astype(np.float32)
        plain = ResidualQuantizer(data, 3, 8, max_iters=5, seed=2)
        joint = ResidualQuantizer(
            data, 3, 8, max_iters=5, seed=2, joint_iters=2, beam=4
        )
        mse = lambda q: float(
            np.mean((np.asarray(q.decode(q.encode(data, beam=4))) - data) ** 2)
        )
        assert mse(joint) <= mse(plain) * (1 + 1e-3)
        assert joint.codebooks.shape == (3, 8, 12)


def test_rq_decode_onehot_bit_exact(rng):
    """One-hot HIGHEST stage gathers (TPU fast path) reproduce the
    take-based additive decode bit-exactly (same f32 stage-sum order)."""
    import jax.numpy as jnp

    from vq_tpu.models.rq import _rq_decode_jit, rq_train

    x = rng.random((300, 16), dtype=np.float32)
    cbs = rq_train(x, num_stages=3, num_centroids=8, max_iters=2, seed=1)
    codes = jnp.asarray(
        np.random.default_rng(5).integers(0, 8, (700, 3)).astype(np.int32)
    )
    a = np.asarray(_rq_decode_jit(codes, cbs, use_onehot=False))
    b = np.asarray(_rq_decode_jit(codes, cbs, use_onehot=True))
    np.testing.assert_array_equal(a, b)

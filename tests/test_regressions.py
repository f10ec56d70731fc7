"""Regression tests — one test per bug the reference fixed and guarded.

Mirrors the reference's regression suite (reference tests/regression_tests.rs;
headers documented per test) so the new framework can't re-introduce the same
class of bug, plus vq_tpu-specific regressions found during this build.
"""

import numpy as np
import pytest

import vq_tpu
from vq_tpu import (
    TSVQ,
    BinaryQuantizer,
    ProductQuantizer,
    ScalarQuantizer,
    distance,
    lloyd,
)
from vq_tpu.errors import (
    DimensionMismatch,
    InvalidParameter,
)


def test_bq_dequantize_uses_configured_high():
    # reference regression_tests.rs:16-43 — dequantize once hardcoded the
    # high level instead of using the configured value.
    q = BinaryQuantizer(0.5, low=5, high=77)
    recon = np.asarray(q.dequantize(np.array([5, 77, 200, 0], dtype=np.uint8)))
    np.testing.assert_array_equal(recon, [5.0, 77.0, 77.0, 5.0])


def test_pq_missing_dim_validation():
    # reference regression_tests.rs:69-113 — PQ once accepted mismatched
    # encode dims silently.
    rng = np.random.default_rng(0)
    data = rng.random((32, 16), dtype=np.float32)
    q = ProductQuantizer(data, 4, 4, max_iters=2)
    with pytest.raises(DimensionMismatch):
        q.encode(rng.random((3, 12), dtype=np.float32))
    with pytest.raises(DimensionMismatch):
        q.quantize(rng.random(12, dtype=np.float32))


def test_tsvq_missing_dim_validation():
    rng = np.random.default_rng(0)
    data = rng.random((32, 16), dtype=np.float32)
    q = TSVQ(data, max_depth=3)
    with pytest.raises(DimensionMismatch):
        q.encode(rng.random((3, 12), dtype=np.float32))


def test_lbg_epsilon_convergence():
    # reference regression_tests.rs:207-225 — LBG once compared centroids
    # exactly and never converged; the eps=1e-6 elementwise test must stop
    # iteration on a stable dataset.
    rng = np.random.default_rng(1)
    # Two tight, well-separated blobs: converges in ~2 iterations.
    data = np.concatenate(
        [
            rng.normal(0, 1e-4, (64, 8)),
            rng.normal(10, 1e-4, (64, 8)),
        ]
    ).astype(np.float32)
    res = lloyd(data, 2, max_iters=50, seed=0)
    assert bool(res.converged)
    assert int(res.iterations) < 50


def test_cosine_zero_norm_and_clamp():
    # reference regression_tests.rs:240-275 — zero-norm vectors once
    # produced NaN; opposite vectors once exceeded the [0,1] clamp.
    z = np.zeros(4, dtype=np.float32)
    a = np.array([1.0, 0, 0, 0], dtype=np.float32)
    assert distance(z, a, "cosine") == pytest.approx(1.0)
    assert distance(z, z, "cosine") == pytest.approx(1.0)
    # anti-parallel: raw 1 - (-1) = 2, clamped to 1.0
    assert distance(a, -a, "cosine") == pytest.approx(1.0)


def test_tsvq_nan_handling():
    # reference regression_tests.rs:281-297 — NaN values once panicked the
    # median sort (total_cmp fix); here NaN rows must build and encode.
    rng = np.random.default_rng(2)
    data = rng.random((32, 8), dtype=np.float32)
    data[3, 2] = np.nan
    q = TSVQ(data, max_depth=3)
    codes = np.asarray(q.encode(data[:5]))
    assert codes.shape == (5,)


def test_sq_levels_overflow():
    # reference regression_tests.rs:303-311 — levels > 256 once overflowed u8.
    with pytest.raises(InvalidParameter):
        ScalarQuantizer(0.0, 1.0, levels=257)
    with pytest.raises(InvalidParameter):
        ScalarQuantizer(0.0, 1.0, levels=100000)


def test_error_payload_introspection():
    # reference regression_tests.rs:317-342 — error variants must carry
    # their parameters for programmatic matching.
    try:
        ScalarQuantizer(1.0, 0.0)
    except InvalidParameter as e:
        assert e.parameter == "max"
    try:
        vq_tpu.pairwise(np.zeros((2, 3)), np.zeros((2, 4)))
    except DimensionMismatch as e:
        assert e.expected == 3 and e.found == 4


def test_sq_decode_extrapolates_not_clamps():
    # reference src/sq.rs:146-151 — decode of out-of-range codes must
    # extrapolate past max (regression guard for "helpful" clamping).
    q = ScalarQuantizer(0.0, 1.0, levels=2)  # step = 1.0
    out = float(np.asarray(q.dequantize(np.array([255], dtype=np.uint8)))[0])
    assert out == pytest.approx(255.0)


def test_bq_nan_maps_low():
    # reference tests/integration_tests.rs:477-489 — NaN >= t is false.
    q = BinaryQuantizer(0.0, low=0, high=1)
    codes = np.asarray(q.quantize(np.array([np.nan, -np.nan, 0.0, -0.0])))
    np.testing.assert_array_equal(codes, [0, 0, 1, 1])


def test_lloyd_max_iters_zero_returns_init():
    # reference `for _ in 0..max_iters` semantics: zero iterations returns
    # the seeded sample untouched.
    rng = np.random.default_rng(3)
    data = rng.random((32, 4), dtype=np.float32)
    res = lloyd(data, 4, max_iters=0, seed=7)
    assert int(res.iterations) == 0
    # centroids are actual data rows
    rows = {tuple(r) for r in np.round(data, 6).tolist()}
    for c in np.round(np.asarray(res.centroids), 6).tolist():
        assert tuple(c) in rows


def test_pq_subspace_seeds_differ():
    # reference src/pq.rs:130 (seed + i): identical subspace data must not
    # produce identical codebooks unless data is identical — distinct
    # per-subspace keys. Build data where both subspaces see the SAME rows:
    rng = np.random.default_rng(4)
    half = rng.random((64, 4), dtype=np.float32)
    data = np.concatenate([half, half], axis=1)  # subspace 0 == subspace 1
    q = ProductQuantizer(data, 2, 4, max_iters=0, seed=0)
    cb = np.asarray(q.codebooks)
    # max_iters=0 -> pure init sample; different fold_in keys -> different picks
    assert not np.array_equal(cb[0], cb[1])


def test_kmeans_single_cluster_mean():
    # k=1 must converge to the exact mean (reference vector.rs unit tests).
    rng = np.random.default_rng(5)
    data = rng.random((100, 8), dtype=np.float32)
    res = lloyd(data, 1, max_iters=5, seed=0)
    np.testing.assert_allclose(
        np.asarray(res.centroids)[0], data.mean(axis=0), rtol=1e-5, atol=1e-5
    )


def test_uint8_codes_roundtrip_pq():
    # vq_tpu regression: encode returns u8 when k<=256; decode must accept
    # u8 (not only i32) without wraparound for code 255.
    rng = np.random.default_rng(6)
    data = rng.random((600, 8), dtype=np.float32)
    q = ProductQuantizer(data, 2, 256, max_iters=1, seed=0)
    codes = q.encode(data)
    assert np.asarray(codes).dtype == np.uint8
    recon = np.asarray(q.decode(codes))
    assert recon.shape == (600, 8)


def test_pq_encode_dispatches_fused_on_tpu(monkeypatch):
    # Round-2 regression (VERDICT r1 #1): pq_encode — and therefore
    # ProductQuantizer.encode, PQIndex.add, IVFPQIndex.add, the eval CLIs —
    # must take the fused Pallas kernel on TPU for L2-family metrics, not
    # the slow XLA path the benchmark never measures.
    import jax

    import vq_tpu.ops.pallas_kernels as pk
    from vq_tpu.models.pq import pq_encode

    calls = []
    real = pk.pq_encode_fused

    def spy(x, cb, block_rows=1024, interpret=False, **kw):
        calls.append(block_rows)
        return real(x, cb, block_rows=block_rows, interpret=True, **kw)

    monkeypatch.setattr(pk, "pq_encode_fused", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    rng = np.random.default_rng(7)
    data = rng.random((300, 16), dtype=np.float32)
    cb = rng.random((4, 8, 4), dtype=np.float32)
    codes_fused = pq_encode(data, cb, "euclidean")
    assert calls, "fused Pallas encode was not dispatched on TPU backend"

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    codes_xla = pq_encode(data, cb, "euclidean")
    np.testing.assert_array_equal(np.asarray(codes_fused), np.asarray(codes_xla))

    # Non-L2 metrics must NOT hit the fused kernel (it is L2-only).
    calls.clear()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    pq_encode(data, cb, "manhattan")
    assert not calls


def test_int_argmin_negative_zero_tie():
    # Round-2 regression: the orderable-int key ordered -0.0 below +0.0,
    # so int2 picked a later -0.0 over an earlier +0.0 — but IEEE compares
    # them equal and equal scores must resolve to the LOWEST index
    # (reference strict-< scan). Keys for -0.0 are canonicalized to +0.0.
    import jax
    import jax.numpy as jnp

    from vq_tpu.ops.pallas_kernels import _int_argmin

    scores = np.array(
        [[0.0, -0.0, 1.0], [-0.0, 0.0, 2.0], [5.0, -0.0, 0.0]], np.float32
    )
    s = jnp.asarray(scores)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    _, idx = _int_argmin(s, col, "int2")
    assert np.asarray(idx).tolist() == [0, 0, 1]

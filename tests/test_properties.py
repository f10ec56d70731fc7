"""Property-based tests (hypothesis) — the invariants tier.

Mirrors the reference's proptest suite (reference tests/property_tests.rs)
and pyvq's hypothesis suite (pyvq/tests/test_properties.py): shape/length
preservation, binariness, determinism, bounded roundtrip error, distance
axioms. Case counts are tuned down for trained quantizers like the
reference's ``cases = 20`` (property_tests.rs:179,245).
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

import vq_tpu
from vq_tpu import (
    BinaryQuantizer,
    Metric,
    ScalarQuantizer,
    distance,
    lloyd,
    pairwise,
)

finite_f32 = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
)


def float32_arrays(min_len=1, max_len=64):
    return st.integers(min_len, max_len).flatmap(
        lambda n: arrays(np.float32, (n,), elements=finite_f32)
    )


def matched_float32_arrays(min_len=1, max_len=64):
    return st.integers(min_len, max_len).flatmap(
        lambda n: st.tuples(
            arrays(np.float32, (n,), elements=finite_f32),
            arrays(np.float32, (n,), elements=finite_f32),
        )
    )


common = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# --- BQ --------------------------------------------------------------------


@common
@given(x=float32_arrays(), threshold=finite_f32)
def test_bq_binariness_and_length(x, threshold):
    q = BinaryQuantizer(threshold, low=0, high=1)
    codes = np.asarray(q.quantize(x))
    assert codes.shape == x.shape
    assert set(np.unique(codes)).issubset({0, 1})


@common
@given(x=float32_arrays())
def test_bq_determinism(x):
    q = BinaryQuantizer(0.0)
    a = np.asarray(q.quantize(x))
    b = np.asarray(q.quantize(x))
    np.testing.assert_array_equal(a, b)


@common
@given(x=float32_arrays())
def test_bq_dequantize_values(x):
    q = BinaryQuantizer(0.5, low=10, high=200)
    recon = np.asarray(q.dequantize(q.quantize(x)))
    assert set(np.unique(recon)).issubset({10.0, 200.0})


# --- SQ --------------------------------------------------------------------


@common
@given(
    x=float32_arrays(),
    levels=st.integers(2, 256),
)
def test_sq_roundtrip_bounded(x, levels):
    lo, hi = -1e6, 1e6
    q = ScalarQuantizer(lo, hi, levels)
    recon = np.asarray(q.dequantize(q.quantize(x)))
    assert recon.shape == x.shape
    # In-range values reconstruct within step/2 (reference
    # property_tests.rs "quantization error bounded"), plus f32 rounding
    # slack proportional to the range magnitude.
    bound = q.step / 2 + (hi - lo) * 1e-6
    assert np.all(np.abs(recon - np.clip(x, lo, hi)) <= bound)


@common
@given(x=float32_arrays())
def test_sq_codes_in_range(x):
    q = ScalarQuantizer(-10.0, 10.0, levels=17)
    codes = np.asarray(q.quantize(x))
    assert codes.max(initial=0) <= 16


# --- Distances -------------------------------------------------------------


@common
@given(ab=matched_float32_arrays())
def test_distance_symmetry_nonneg(ab):
    a, b = ab
    for metric in ("squared_euclidean", "euclidean", "manhattan"):
        dab = distance(a, b, metric)
        dba = distance(b, a, metric)
        assert dab >= 0
        assert dab == pytest.approx(dba, rel=1e-4, abs=1e-4)


@common
@given(a=float32_arrays())
def test_distance_self_zero(a):
    for metric in ("squared_euclidean", "euclidean", "manhattan"):
        scale = max(1.0, float(np.abs(a).max(initial=0.0)) ** 2 * a.size)
        assert distance(a, a, metric) / scale == pytest.approx(0.0, abs=1e-4)


@common
@given(ab=matched_float32_arrays())
def test_cosine_range(ab):
    a, b = ab
    d = distance(a, b, "cosine")
    assert 0.0 <= d <= 1.0  # clamped like the reference (distance.rs:112-119)


@common
@given(ab=matched_float32_arrays(min_len=2))
def test_pairwise_matches_scalar(ab):
    a, b = ab
    D = np.asarray(pairwise(a[None, :], b[None, :], Metric.EUCLIDEAN))
    assert D[0, 0] == pytest.approx(distance(a, b, "euclidean"), rel=1e-4, abs=1e-4)


# --- k-means / PQ ----------------------------------------------------------


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(16, 64),
    d=st.sampled_from([4, 8]),
    k=st.integers(2, 8),
)
def test_lloyd_deterministic_and_shaped(seed, n, d, k):
    rng = np.random.default_rng(seed)
    data = rng.random((n, d), dtype=np.float32)
    r1 = lloyd(data, k, max_iters=3, seed=seed)
    r2 = lloyd(data, k, max_iters=3, seed=seed)
    np.testing.assert_array_equal(np.asarray(r1.centroids), np.asarray(r2.centroids))
    assert r1.centroids.shape == (k, d)
    assert int(np.asarray(r1.assignments).max()) < k


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**31 - 1))
def test_pq_codes_in_range_and_deterministic(seed):
    rng = np.random.default_rng(seed)
    data = rng.random((64, 16), dtype=np.float32)
    q1 = vq_tpu.ProductQuantizer(data, 4, 8, max_iters=3, seed=seed)
    q2 = vq_tpu.ProductQuantizer(data, 4, 8, max_iters=3, seed=seed)
    c1, c2 = np.asarray(q1.encode(data)), np.asarray(q2.encode(data))
    np.testing.assert_array_equal(c1, c2)
    assert c1.max() < 8
    assert c1.shape == (64, 4)


# --- RQ / OPQ ---------------------------------------------------------------


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**31 - 1))
def test_rq_monotone_stage_reconstruction(seed):
    # Adding a stage never increases reconstruction error for the SAME
    # prefix codes (each stage quantizes the remaining residual).
    rng = np.random.default_rng(seed)
    data = rng.random((128, 8), dtype=np.float32)
    rq = vq_tpu.ResidualQuantizer(data, 3, 8, max_iters=3, seed=seed)
    codes = np.asarray(rq.encode(data))
    cbs = np.asarray(rq.codebooks)
    prev = np.mean(data.astype(np.float64) ** 2)
    recon = np.zeros_like(data, dtype=np.float64)
    for s_i in range(3):
        recon = recon + cbs[s_i][codes[:, s_i]]
        err = float(np.mean((data - recon) ** 2))
        assert err <= prev + 1e-6
        prev = err


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**31 - 1))
def test_opq_rotation_orthogonal_and_codes_in_range(seed):
    rng = np.random.default_rng(seed)
    data = rng.random((96, 16), dtype=np.float32)
    opq = vq_tpu.OPQQuantizer(data, 4, 4, opq_iters=2, pq_iters=2, seed=seed)
    r = np.asarray(opq.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(16), atol=1e-3)
    codes = np.asarray(opq.encode(data))
    assert codes.max() < 4


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    x=arrays(np.float32, (40, 8), elements=finite_f32),
    levels=st.integers(2, 256),
)
def test_perdim_sq_roundtrip_bounded(x, levels):
    q = vq_tpu.PerDimScalarQuantizer.from_data(x, levels=levels)
    rec = np.asarray(q.dequantize(q.quantize(x)))
    steps = np.asarray(q.steps)
    span = np.asarray(q.maxs) - np.asarray(q.mins)
    # Constant columns get a tiny padded range (~|x|*1e-6) that sits within
    # a few f32 ulps of the values themselves, so the achievable roundtrip
    # error is step/2 plus O(ulp(|x|)) — include that term in the bound.
    ulp = np.spacing(np.max(np.abs(x), axis=0).astype(np.float32))
    bound = steps / 2 + span * 1e-5 + 4.0 * ulp + 1e-6
    assert np.all(np.abs(rec - x) <= bound[None, :])


# --- round-2 primitives ------------------------------------------------------


@common
@given(
    arrays(
        np.float32, (12, 20),
        # allow_subnormal=False: XLA's float min flushes denormals to zero
        # (FTZ) while the bitcast key path preserves them exactly — the
        # int2 min VALUE is more precise there, so the comparison only
        # holds for normal floats (argmin indices agree either way).
        elements=st.floats(
            -1e6, 1e6, allow_nan=False, allow_subnormal=False, width=32
        ),
    )
)
def test_int_argmin_int2_matches_variadic(scores):
    """int2 integer-key argmin == jnp.min/argmin on finite normal scores
    (including negatives, +/-0.0, exact ties)."""
    import jax
    import jax.numpy as jnp

    from vq_tpu.ops.pallas_kernels import _int_argmin

    s = jnp.asarray(scores)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mv_r, idx_r = _int_argmin(s, col, "reduce")
    mv_2, idx_2 = _int_argmin(s, col, "int2")
    np.testing.assert_array_equal(np.asarray(idx_2), np.asarray(idx_r))
    np.testing.assert_array_equal(np.asarray(mv_2), np.asarray(mv_r))


@common
@given(
    arrays(
        np.float32, (40, 8),
        elements=st.floats(0, 1, allow_nan=False, width=32),
    ),
    st.integers(0, 2**31 - 1),
)
def test_kpp_device_seeds_are_data_rows(data, seed):
    from vq_tpu.ops.kmeans import kmeans_plusplus_init_device

    seeds = np.asarray(kmeans_plusplus_init_device(data, 4, seed=seed))
    rows = {tuple(r) for r in data.round(6).tolist()}
    assert all(tuple(s) in rows for s in seeds.round(6).tolist())


@common
@given(st.integers(0, 2**31 - 1))
def test_rq_joint_solve_never_worse_for_fixed_codes(seed):
    """The least-squares codebook update is optimal for fixed codes, so it
    can never increase reconstruction MSE under those codes."""
    import jax.numpy as jnp

    from vq_tpu.models.rq import (
        _rq_solve_codebooks_jit,
        rq_decode,
        rq_encode,
        rq_train,
    )

    rng = np.random.default_rng(seed)
    data = rng.normal(0, 1, (120, 8)).astype(np.float32)
    cbs = rq_train(data, 2, 4, max_iters=3, seed=seed % 1000)
    codes = rq_encode(data, cbs).astype(np.int32)
    before = float(np.mean((np.asarray(rq_decode(codes, cbs)) - data) ** 2))
    cbs2 = _rq_solve_codebooks_jit(
        jnp.asarray(data), jnp.asarray(codes), 4, 64
    )
    after = float(np.mean((np.asarray(rq_decode(codes, cbs2)) - data) ** 2))
    assert after <= before * (1 + 1e-4)


@common
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(4, 120))
def test_flat_index_matches_bruteforce(seed, n):
    """FlatIndex top-k must equal the stable-argsort brute force (ids AND
    distances) for every metric — the exactness contract."""
    from vq_tpu.search import FlatIndex

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    k = min(5, n)
    idx = FlatIndex.from_data(x)
    ids, d = idx.search(q, k=k, chunk=max(n // 2, 1))
    ref = ((x[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    order = np.argsort(ref, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(
        np.asarray(d),
        np.take_along_axis(ref, np.asarray(ids), axis=1),
        rtol=1e-4, atol=1e-4,
    )
    # distances agree with the reference order's distances (ids may swap
    # only on exact ties)
    np.testing.assert_allclose(
        np.asarray(d), np.take_along_axis(ref, order, axis=1),
        rtol=1e-4, atol=1e-4,
    )


@common
@given(seed=st.integers(0, 2**31 - 1))
def test_flat_range_counts_equal_bruteforce(seed):
    from vq_tpu.search import FlatIndex

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((60, 6)).astype(np.float32)
    q = x[:4] + 0.01
    ref = ((x[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    radius = float(np.quantile(ref, 0.3))
    idx = FlatIndex.from_data(x)
    _, _, counts = idx.range_search(q, radius, max_results=60)
    expect = (ref <= radius).sum(1)
    # f32 matmul-form boundary wobble can move a hit across the radius
    assert (np.abs(np.asarray(counts) - expect) <= 1).all()


@common
@given(seed=st.integers(0, 2**31 - 1), d=st.integers(2, 24))
def test_random_rotation_is_isometry(seed, d):
    """Seeded rotations are orthonormal: distances and norms preserved,
    reverse(apply(x)) == x."""
    from vq_tpu.transforms import RotationTransform

    t = RotationTransform.random(d, seed=seed)
    r = np.asarray(t.matrix)
    np.testing.assert_allclose(r @ r.T, np.eye(d), atol=1e-5)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((10, d)).astype(np.float32)
    y = np.asarray(t.apply(x))
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=1), np.linalg.norm(x, axis=1),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(t.reverse(y)), x, atol=1e-4)


@common
@given(seed=st.integers(0, 2**31 - 1))
def test_pca_reverse_never_increases_error_with_more_components(seed):
    """Reconstruction error is monotone non-increasing in d_out."""
    from vq_tpu.transforms import PCATransform

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((80, 12)).astype(np.float32)
    errs = []
    for d_out in (2, 6, 12):
        t = PCATransform(12, d_out).fit(x)
        back = np.asarray(t.reverse(t.apply(x)))
        errs.append(float(((back - x) ** 2).mean()))
    assert errs[0] >= errs[1] - 1e-5 and errs[1] >= errs[2] - 1e-5
    assert errs[2] < 1e-6  # full-rank is exact


# -- round-2 surfaces: IVF range_search, binary IVF, graph search ------------


def corpus_2d(min_n=32, max_n=200, d=8):
    return st.integers(min_n, max_n).flatmap(
        lambda n: arrays(
            np.float32, (n, d),
            elements=st.floats(-10, 10, allow_nan=False, width=32),
        )
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=corpus_2d(), radius=st.floats(0.5, 200.0))
def test_ivf_flat_range_counts_match_brute_force(data, radius):
    """Full-probe range_search counts == the dense radius scan, and every
    returned id is a true hit (exact stored rows => exact distances)."""
    from vq_tpu import IVFFlatIndex

    idx = IVFFlatIndex.train(data, nlist=min(4, len(data)), seed=0,
                             max_iters=3)
    idx.add(data)
    q = data[:3]
    ids, vals, counts = idx.range_search(
        q, radius, nprobe=idx.nlist, max_results=max(8, len(data))
    )
    ref = ((data[None] - q[:, None]) ** 2).sum(-1)
    hits = ref <= radius
    got = np.asarray(counts)
    # fp reassociation can flip exact-boundary hits
    boundary = (np.abs(ref - radius) < 1e-3).sum(1)
    assert (np.abs(got - hits.sum(1)) <= boundary).all()
    ids_np = np.asarray(ids)
    for r in range(q.shape[0]):
        for i in ids_np[r][ids_np[r] >= 0]:
            assert ref[r, i] <= radius + 1e-3


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=corpus_2d(min_n=40, d=40))
def test_ivf_binary_full_probe_matches_flat_hamming(data):
    """nprobe=nlist binary IVF returns the same Hamming value multiset
    as the flat packed scan (ids may permute among exact ties)."""
    from vq_tpu import IVFBinaryIndex
    from vq_tpu.search import BinaryIndex

    idx = IVFBinaryIndex.train(data, nlist=4, seed=1, max_iters=3)
    idx.add(data)
    flat = BinaryIndex(data.shape[1])
    flat.add(data)
    q = data[:2]
    k = min(5, len(data))
    _, d_i = idx.search(q, k=k, nprobe=idx.nlist)
    _, d_f = flat.search(q, k=k)
    np.testing.assert_array_equal(
        np.sort(np.asarray(d_i), 1), np.sort(np.asarray(d_f), 1)
    )


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=corpus_2d(min_n=64, max_n=256, d=8),
       k=st.integers(1, 8), beam=st.integers(8, 32))
def test_graph_search_contract(data, k, beam):
    """Graph search invariants on arbitrary data: distances ascending,
    returned ids valid and DISTINCT (pool dedup invariant), values exact
    squared-L2 to the returned rows."""
    from vq_tpu import GraphIndex

    gi = GraphIndex.build(data, degree=8, seed=0)
    q = data[:3]
    ids, d = gi.search(q, k=k, beam=beam)
    ids_np, d_np = np.asarray(ids), np.asarray(d)
    assert ids_np.shape == (3, k)
    for r in range(3):
        real = ids_np[r][ids_np[r] >= 0]
        assert len(set(real.tolist())) == len(real)  # no duplicates
        assert (real < len(data)).all()
        dr = d_np[r][ids_np[r] >= 0]
        assert (np.diff(dr) >= -1e-5).all()  # ascending
        want = ((data[real] - q[r]) ** 2).sum(-1)
        np.testing.assert_allclose(dr, want, rtol=1e-4, atol=1e-2)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=corpus_2d(min_n=32, max_n=200, d=8),
       split=st.floats(0.1, 0.9), k=st.integers(1, 8))
def test_merge_from_equals_single_build(data, split, k):
    """Merging two flat indexes is indistinguishable from one index built
    over the concatenation (ids, distances, ntotal), and empties the
    source — on arbitrary data and split points."""
    from vq_tpu import FlatIndex

    cut = max(1, min(len(data) - 1, int(len(data) * split)))
    a = FlatIndex.from_data(data[:cut])
    b = FlatIndex.from_data(data[cut:])
    whole = FlatIndex.from_data(data)
    moved = a.merge_from(b)
    assert moved == len(data) - cut
    assert a.ntotal == len(data) and b.ntotal == 0
    q = data[:3]
    ids_m, d_m = a.search(q, k=k)
    ids_w, d_w = whole.search(q, k=k)
    np.testing.assert_array_equal(np.asarray(ids_m), np.asarray(ids_w))
    np.testing.assert_allclose(np.asarray(d_m), np.asarray(d_w), atol=1e-4)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=corpus_2d(min_n=48, max_n=160, d=8),
       t=st.integers(1, 4), q=st.integers(1, 9), k=st.integers(1, 6))
def test_batch_pipeline_matches_search(data, t, q, k):
    """One-dispatch pipelined serving is bit-identical to per-batch
    search for arbitrary [T, Q] shapes."""
    from vq_tpu import BatchPipeline, FlatIndex

    idx = FlatIndex.from_data(data)
    rng = np.random.default_rng(int(abs(float(data[0, 0])) * 1000) % 2**31)
    batches = rng.normal(size=(t, q, 8)).astype(np.float32)
    pipe = BatchPipeline(idx, k=k)
    ids_p, vals_p = pipe.search(batches)
    for i in range(t):
        ids_s, vals_s = idx.search(batches[i], k)
        np.testing.assert_array_equal(np.asarray(ids_p[i]), np.asarray(ids_s))
        np.testing.assert_allclose(
            np.asarray(vals_p[i]), np.asarray(vals_s), atol=1e-5
        )


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=corpus_2d(min_n=64, max_n=200, d=8),
       k=st.integers(2, 6), nredo=st.integers(1, 3))
def test_kmeans_nredo_is_best_of(data, k, nredo):
    """Kmeans(nredo=R) returns exactly the best of R deterministic
    restarts: obj == min(all_objs), len(all_objs) == R, and the run is
    reproducible for a fixed seed."""
    from vq_tpu import Kmeans

    km = Kmeans(8, k, niter=4, nredo=nredo, seed=5)
    km2 = Kmeans(8, k, niter=4, nredo=nredo, seed=5)
    obj = km.train(data)
    obj2 = km2.train(data)
    assert len(km.all_objs) == nredo
    assert obj == pytest.approx(min(km.all_objs), rel=1e-6)
    assert obj == obj2
    np.testing.assert_array_equal(
        np.asarray(km.centroids), np.asarray(km2.centroids)
    )


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=corpus_2d(min_n=64, max_n=200, d=8),
       k=st.integers(1, 5), kf=st.integers(1, 6))
def test_refine_flat_equals_exact_rescoring(data, k, kf):
    """A flat-f32 refiner returns EXACTLY the best-k of the base's
    candidates under true squared-L2 — for any corpus, k, and k_factor."""
    from vq_tpu import PQIndex, ProductQuantizer, RefineIndex

    pq = ProductQuantizer(data, 2, 4, max_iters=2, seed=1)
    base = PQIndex(ProductQuantizer(codebooks=pq.codebooks))
    ref = RefineIndex(base, "flat")
    ref.add(data)
    q = data[:3] + 0.01
    ids, d = ref.search(q, k, k_factor=kf)
    fetch = max(k, kf * k)
    b_ids, _ = base.search(q, min(fetch, len(data)))
    for i in range(3):
        cand = np.asarray(b_ids)[i]
        cand = cand[cand >= 0]
        exact = np.sum((data[cand] - q[i]) ** 2, axis=-1)
        order = np.argsort(exact, kind="stable")[:k]
        got = np.asarray(ids)[i]
        got = got[got >= 0]
        np.testing.assert_array_equal(got, cand[order][: len(got)])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=corpus_2d(min_n=32, max_n=160, d=9),
       levels=st.sampled_from([2, 4, 16]))
def test_sq_subbyte_pack_is_lossless(data, levels):
    """Packed sub-byte SQ storage decodes to exactly the same rows as
    the unpacked quantizer for any corpus, level count, and odd dims."""
    from vq_tpu import PerDimScalarQuantizer, SQIndex

    sq = PerDimScalarQuantizer.from_data(data, levels)
    idx = SQIndex(sq)
    idx.add(data)
    rec = np.asarray(idx.reconstruct(np.arange(len(data))))
    expect = np.asarray(sq.dequantize(sq.quantize(data)))
    np.testing.assert_array_equal(rec, expect)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=corpus_2d(min_n=40, max_n=120, d=8),
       reps=st.integers(2, 3), k=st.integers(2, 4))
def test_weighted_accumulate_duplication_equivalence(data, reps, k):
    """One weighted assign+accumulate pass == the same pass over the
    duplicated corpus, for ANY data (the per-iteration invariant behind
    weighted Lloyd; end-to-end runs additionally depend on random
    empty-cluster reseeds, which are not weight-aware by design — those
    are covered by the seeded unit test on non-degenerate data)."""
    from vq_tpu.ops.kmeans import _assign_accumulate

    n = data.shape[0]
    dup = np.concatenate([data] + [data[: n // 4]] * (reps - 1))
    w = np.ones(n, np.float32)
    w[: n // 4] = float(reps)
    cents = data[:k].astype(np.float32) + 0.25
    s1, c1, i1 = _assign_accumulate(
        np.asarray(dup), np.asarray(cents), 32
    )
    s2, c2, i2 = _assign_accumulate(
        np.asarray(data), np.asarray(cents), 32, np.asarray(w)
    )
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-4)
    np.testing.assert_allclose(float(i1), float(i2), rtol=1e-4, atol=1e-2)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    m=st.integers(1, 5),
    k=st.sampled_from([3, 16, 100, 129, 256]),
    n=st.integers(1, 700),
    q=st.integers(1, 9),
    fetch=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_adc_scan_topk_fused_property(m, k, n, q, fetch, seed):
    """For ANY (m, k, n, Q, fetch): the fused gather+top-k scan's
    per-tile candidates reproduce the brute-force table sums exactly —
    sorted ascending with lowest-index ties, inf/-1 padded (interpret
    mode; the hypothesis analog of the hardware parity runs)."""
    import jax.numpy as jnp

    from vq_tpu.ops.pallas_kernels import adc_scan_topk_fused

    r = np.random.default_rng(seed)
    tables = jnp.asarray(r.random((q, m, k), dtype=np.float32))
    codes_t = jnp.asarray(r.integers(0, k, (m, n)).astype(np.uint8))
    block = 256
    vals, ids = adc_scan_topk_fused(
        tables, codes_t, fetch=fetch, block_cols=block, interpret=True
    )
    vals, ids = np.asarray(vals), np.asarray(ids)
    full = np.zeros((q, n), np.float32)
    tb, ct = np.asarray(tables), np.asarray(codes_t)
    for i in range(m):
        full += tb[:, i, :][:, ct[i]]
    for t, lo in enumerate(range(0, n, block)):
        hi = min(lo + block, n)
        take = min(fetch, hi - lo)
        order = np.argsort(full[:, lo:hi], axis=1, kind="stable")[:, :take]
        np.testing.assert_allclose(
            vals[:, t * 128: t * 128 + take],
            np.take_along_axis(full[:, lo:hi], order, axis=1),
            rtol=1e-6,
        )
        np.testing.assert_array_equal(
            ids[:, t * 128: t * 128 + take], lo + order
        )
        assert np.isinf(vals[:, t * 128 + take: (t + 1) * 128]).all()
        assert (ids[:, t * 128 + take: (t + 1) * 128] == -1).all()

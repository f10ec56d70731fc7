"""Native C++ kernel library: build, correctness, and TPU/JAX parity.

The analog of the reference's SIMD-vs-scalar consistency suite
(src/core/distance.rs:177-223) plus FFI smoke tests
(src/core/hsdlib_ffi.rs:157-208): the native library is the golden oracle the
XLA paths are checked against.
"""

import numpy as np
import pytest

from vq_tpu import Metric, ProductQuantizer, distance, pairwise
from vq_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(1)
    return (
        rng.standard_normal(100).astype(np.float32),
        rng.standard_normal(100).astype(np.float32),
    )


class TestPairKernels:
    def test_backend_name(self):
        name = native.get_native_backend()
        assert isinstance(name, str) and "native" in name

    def test_sqeuclidean_vs_numpy(self, vecs):
        a, b = vecs
        want = float(((a - b) ** 2).sum())
        assert native.sqeuclidean(a, b) == pytest.approx(want, rel=1e-4)

    def test_manhattan_vs_numpy(self, vecs):
        a, b = vecs
        want = float(np.abs(a - b).sum())
        assert native.manhattan(a, b) == pytest.approx(want, rel=1e-4)

    def test_dot_vs_numpy(self, vecs):
        a, b = vecs
        assert native.dot(a, b) == pytest.approx(float(a @ b), rel=1e-4)

    def test_cosine_vs_numpy(self, vecs):
        a, b = vecs
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert native.cosine_similarity(a, b) == pytest.approx(want, rel=1e-4)

    def test_jax_distance_parity(self, vecs):
        # JAX distances must match the native oracle within the reference's
        # own SIMD-vs-scalar tolerance of 1e-4 (src/core/distance.rs:190-196).
        a, b = vecs
        assert distance(a, b, "squared_euclidean") == pytest.approx(
            native.sqeuclidean(a, b), rel=1e-4
        )
        assert distance(a, b, "manhattan") == pytest.approx(
            native.manhattan(a, b), rel=1e-4
        )
        # the reference clamps cosine distance to [0, 1]
        # (src/core/distance.rs:117-119) — apply the same clamp to the oracle
        want = min(max(1.0 - native.cosine_similarity(a, b), 0.0), 1.0)
        assert distance(a, b, "cosine") == pytest.approx(want, abs=1e-4)


class TestBatchKernels:
    def test_sqeuclidean_batch_parity(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((50, 24)).astype(np.float32)
        c = rng.standard_normal((9, 24)).astype(np.float32)
        got = native.sqeuclidean_batch(x, c)
        want = np.asarray(pairwise(x, c, Metric.SQUARED_EUCLIDEAN))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_pq_encode_parity(self):
        rng = np.random.default_rng(3)
        data = rng.random((300, 32), dtype=np.float32)
        pq = ProductQuantizer(data, 4, 16, max_iters=10, seed=0)
        cb = np.asarray(pq.codebooks)
        native_codes = native.pq_encode(data, cb)
        jax_codes = np.asarray(pq.encode(data))
        # Occasional near-tie flips are allowed (different summation order);
        # require > 99.5% agreement and identical reconstruction error.
        agree = (native_codes == jax_codes).mean()
        assert agree > 0.995, f"code agreement only {agree:.4f}"

    def test_assign_parity(self):
        rng = np.random.default_rng(4)
        x = rng.random((500, 16), dtype=np.float32)
        c = rng.random((32, 16), dtype=np.float32)
        from vq_tpu.ops.kmeans import assign as jax_assign

        native_codes = native.assign(x, c)
        jax_codes = np.asarray(jax_assign(x, c)[0])
        agree = (native_codes == jax_codes).mean()
        assert agree > 0.995

    def test_pq_encode_multithreaded_matches(self):
        rng = np.random.default_rng(5)
        data = rng.random((2048, 16), dtype=np.float32)
        cb = rng.random((4, 8, 4)).astype(np.float32)
        a = native.pq_encode(data, cb, num_threads=1)
        b = native.pq_encode(data, cb, num_threads=4)
        np.testing.assert_array_equal(a, b)


class TestFuzzParity:
    """Differential fuzzing: exact code agreement between the XLA paths and
    the native C++ oracle over many random shapes and seeds."""

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_assign_exact_match(self, seed):
        from vq_tpu.ops.kmeans import assign

        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 700))
        d = int(rng.integers(1, 96))
        k = int(rng.integers(1, 300))
        x = rng.standard_normal((n, d)).astype(np.float32)
        c = rng.standard_normal((k, d)).astype(np.float32)
        got, _ = assign(x, c)
        want = native.assign(x, c)
        np.testing.assert_array_equal(np.asarray(got), want)

    @pytest.mark.parametrize("seed", [10, 11, 12])
    def test_pq_encode_exact_match(self, seed):
        from vq_tpu.models.pq import pq_encode

        rng = np.random.default_rng(seed)
        m = int(rng.integers(1, 9))
        s = int(rng.integers(1, 17))
        k = int(rng.integers(2, 257))
        n = int(rng.integers(1, 500))
        x = rng.standard_normal((n, m * s)).astype(np.float32)
        cb = rng.standard_normal((m, k, s)).astype(np.float32)
        got = np.asarray(pq_encode(x, cb, "squared_euclidean"))
        want = native.pq_encode(x, cb)
        np.testing.assert_array_equal(got, want.astype(got.dtype))

"""Distance-metric unit tests.

Mirrors the reference's distance tests (src/core/distance.rs:122-224) plus
batch-path consistency checks the reference can't express.
"""

import numpy as np
import pytest

import vq_tpu
from vq_tpu import Distance, DimensionMismatch, Metric, distance, nearest, pairwise, rowwise


class TestScalarPairs:
    def test_squared_euclidean(self):
        # reference: src/core/distance.rs:130-136
        assert distance([1.0, 2.0, 3.0], [4.0, 6.0, 8.0], "squared_euclidean") == pytest.approx(50.0, abs=1e-5)

    def test_euclidean(self):
        assert distance([1.0, 2.0, 3.0], [4.0, 6.0, 8.0], "euclidean") == pytest.approx(np.sqrt(50.0), abs=1e-5)

    def test_manhattan(self):
        assert distance([1.0, 2.0, 3.0], [4.0, 6.0, 8.0], "manhattan") == pytest.approx(12.0, abs=1e-5)

    def test_cosine_orthogonal(self):
        # reference: src/core/distance.rs:148-158
        assert distance([1.0, 0.0], [0.0, 1.0], "cosine") == pytest.approx(1.0, abs=1e-6)

    def test_cosine_identical(self):
        assert distance([1.0, 1.0], [1.0, 1.0], "cosine") == pytest.approx(0.0, abs=1e-6)

    def test_cosine_zero_norm_is_one(self):
        # reference: src/core/distance.rs:112-115 (EPSILON=1e-10 guard)
        assert distance([0.0, 0.0], [1.0, 1.0], "cosine") == 1.0
        assert distance([1.0, 1.0], [0.0, 0.0], "cosine") == 1.0

    def test_cosine_clamped_to_unit_interval(self):
        # Anti-parallel vectors: raw 1-sim would be 2.0; reference clamps to
        # [0, 1] (src/core/distance.rs:117-119).
        assert distance([1.0, 0.0], [-1.0, 0.0], "cosine") == 1.0

    def test_dimension_mismatch(self):
        with pytest.raises(DimensionMismatch):
            distance([1.0, 2.0], [1.0], "euclidean")

    def test_dimension_mismatch_is_value_error(self):
        # pyvq maps VqError to ValueError (pyvq/src/pq.rs:86)
        with pytest.raises(ValueError):
            distance([1.0, 2.0], [1.0], "euclidean")


class TestBatched:
    @pytest.mark.parametrize("metric", list(Metric))
    def test_pairwise_matches_scalar(self, metric, rng):
        x = rng.standard_normal((7, 9)).astype(np.float32)
        c = rng.standard_normal((5, 9)).astype(np.float32)
        d = np.asarray(pairwise(x, c, metric))
        assert d.shape == (7, 5)
        for i in range(7):
            for j in range(5):
                assert d[i, j] == pytest.approx(
                    distance(x[i], c[j], metric), rel=1e-4, abs=1e-4
                )

    @pytest.mark.parametrize("metric", list(Metric))
    def test_rowwise_matches_scalar(self, metric, rng):
        x = rng.standard_normal((6, 4)).astype(np.float32)
        y = rng.standard_normal((6, 4)).astype(np.float32)
        d = np.asarray(rowwise(x, y, metric))
        for i in range(6):
            assert d[i] == pytest.approx(
                distance(x[i], y[i], metric), rel=1e-4, abs=1e-5
            )

    def test_pairwise_numpy_reference(self, rng):
        # batch sq-euclidean vs numpy ground truth (the analog of the
        # reference's SIMD-vs-scalar consistency test,
        # src/core/distance.rs:177-223).
        x = rng.standard_normal((20, 16)).astype(np.float32)
        c = rng.standard_normal((8, 16)).astype(np.float32)
        got = np.asarray(pairwise(x, c, "squared_euclidean"))
        want = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_nearest_lowest_index_ties(self):
        # Duplicate centroids: argmin must pick the lowest index
        # (reference strict `<` scan, src/core/vector.rs:352-363).
        x = np.array([[1.0, 1.0]], dtype=np.float32)
        c = np.array([[0.0, 0.0], [1.0, 1.0], [1.0, 1.0]], dtype=np.float32)
        codes, dists = nearest(x, c)
        assert int(codes[0]) == 1
        assert float(dists[0]) == pytest.approx(0.0, abs=1e-6)

    def test_pairwise_non_negative_and_self_zero(self, rng):
        x = rng.standard_normal((10, 8)).astype(np.float32)
        d = np.asarray(pairwise(x, x, "squared_euclidean"))
        assert (d >= 0).all()
        np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-3)


class TestDistanceClass:
    def test_factories_and_names(self):
        # reference: pyvq/src/distance.rs:49-78 static factories
        assert Distance.euclidean().name == "euclidean"
        assert Distance.squared_euclidean().name == "squared_euclidean"
        assert Distance.manhattan().name == "manhattan"
        assert Distance.cosine().name == "cosine"

    def test_string_ctor(self):
        # reference: pyvq/src/distance.rs:32-46
        assert Distance("cosine").metric is Metric.COSINE
        with pytest.raises(ValueError):
            Distance("chebyshev")

    def test_compute(self):
        d = Distance.euclidean().compute([0.0, 0.0], [3.0, 4.0])
        assert d == pytest.approx(5.0, abs=1e-5)

    def test_repr_and_eq(self):
        assert "euclidean" in repr(Distance.euclidean())
        assert Distance.cosine() == Distance("cosine")
        assert Distance.cosine() == "cosine"


def test_get_backend_nonempty():
    # Analog of the reference's backend introspection smoke test
    # (src/core/hsdlib_ffi.rs:157-208).
    name = vq_tpu.get_backend()
    assert isinstance(name, str) and len(name) > 0
    assert vq_tpu.get_simd_backend() == name

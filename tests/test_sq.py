"""ScalarQuantizer tests (reference: src/sq.rs tests + regression suite)."""

import numpy as np
import pytest

from vq_tpu import InvalidParameter, ScalarQuantizer


class TestBasics:
    def test_doc_example(self):
        # reference doctest: src/sq.rs:17-19
        sq = ScalarQuantizer(0.0, 1.0, 11)
        np.testing.assert_array_equal(
            np.asarray(sq.quantize([0.0, 0.5, 1.0])), [0, 5, 10]
        )

    def test_step(self):
        sq = ScalarQuantizer(-1.0, 1.0, 5)
        assert sq.step == pytest.approx(0.5)
        assert sq.min == -1.0 and sq.max == 1.0 and sq.levels == 5

    def test_scalar_roundtrip_bounded(self):
        # reference: src/sq.rs:158-170
        sq = ScalarQuantizer(-1.0, 1.0, 5)
        for x in [-1.2, -1.0, -0.8, -0.3, 0.0, 0.3, 0.6, 1.0, 1.2]:
            idx = int(sq.quantize([x])[0])
            recon = sq.min + idx * sq.step
            clamped = min(max(x, sq.min), sq.max)
            assert abs(recon - clamped) <= sq.step / 2 + 1e-6

    def test_out_of_range_clamps(self):
        sq = ScalarQuantizer(0.0, 1.0, 256)
        codes = np.asarray(sq.quantize([-5.0, 5.0]))
        np.testing.assert_array_equal(codes, [0, 255])

    def test_decode_no_clamp_extrapolates(self):
        # Decode extrapolates for out-of-range codes — no clamping
        # (reference src/sq.rs:146-151; regression-tested there).
        sq = ScalarQuantizer(0.0, 1.0, 11)  # step 0.1, max code 10
        rec = float(sq.dequantize(np.array([200], dtype=np.uint8))[0])
        assert rec == pytest.approx(20.0, rel=1e-5)  # far beyond max

    def test_round_half_away(self):
        # Rust f32::round rounds half away from zero: 0.5/step=5 exactly at
        # midpoint between levels — with levels=3 on [0,1], step=0.5;
        # x=0.25 -> t=0.5 -> rounds to 1 (not 0 as bankers' rounding would).
        sq = ScalarQuantizer(0.0, 1.0, 3)
        assert int(sq.quantize([0.25])[0]) == 1
        assert int(sq.quantize([0.75])[0]) == 2

    def test_large_vectors(self):
        # reference: src/sq.rs:172-178
        sq = ScalarQuantizer(-1000.0, 1000.0, 256)
        x = np.arange(1024, dtype=np.float32) - 512.0
        assert np.asarray(sq.quantize(x)).shape == (1024,)

    def test_batch_2d(self, rng):
        sq = ScalarQuantizer(0.0, 1.0, 256)
        x = rng.random((10, 20), dtype=np.float32)
        codes = sq.quantize(x)
        rec = np.asarray(sq.dequantize(codes))
        assert rec.shape == (10, 20)
        assert np.abs(rec - np.clip(x, 0, 1)).max() <= sq.step / 2 + 1e-6


class TestValidation:
    def test_invalid_range(self):
        # reference: src/sq.rs:181-184
        with pytest.raises(InvalidParameter):
            ScalarQuantizer(1.0, -1.0, 5)

    def test_equal_range(self):
        with pytest.raises(InvalidParameter):
            ScalarQuantizer(1.0, 1.0, 5)

    def test_too_few_levels(self):
        with pytest.raises(InvalidParameter):
            ScalarQuantizer(-1.0, 1.0, 1)

    def test_too_many_levels(self):
        # levels > 256 overflows u8 (reference regression
        # tests/regression_tests.rs:303-311)
        with pytest.raises(InvalidParameter):
            ScalarQuantizer(-1.0, 1.0, 257)

    def test_nan_inf_rejected(self):
        # reference: src/sq.rs:193-211
        for bad in (float("nan"), float("inf"), float("-inf")):
            with pytest.raises(InvalidParameter):
                ScalarQuantizer(bad, 1.0, 256)
            with pytest.raises(InvalidParameter):
                ScalarQuantizer(-1.0, bad, 256)

    def test_errors_are_value_errors(self):
        with pytest.raises(ValueError):
            ScalarQuantizer(1.0, -1.0, 5)


class TestPerDimScalarQuantizer:
    def test_fit_and_roundtrip(self, rng):
        from vq_tpu import PerDimScalarQuantizer, ScalarQuantizer

        x = (rng.random((400, 8), dtype=np.float32)
             * np.arange(1, 9, dtype=np.float32))
        q = PerDimScalarQuantizer.from_data(x)
        codes = np.asarray(q.quantize(x))
        assert codes.dtype == np.uint8
        rec = np.asarray(q.dequantize(codes))
        mse_pd = float(np.mean((x - rec) ** 2))
        g = ScalarQuantizer(float(x.min()), float(x.max()))
        mse_g = float(np.mean(
            (x - np.asarray(g.dequantize(g.quantize(x)))) ** 2
        ))
        assert mse_pd < mse_g  # per-dim ranges beat a global range

    def test_constant_dimension(self, rng):
        from vq_tpu import PerDimScalarQuantizer

        x = rng.random((50, 3), dtype=np.float32)
        x[:, 1] = 4.2  # zero-range dimension
        q = PerDimScalarQuantizer.from_data(x)
        rec = np.asarray(q.dequantize(q.quantize(x)))
        np.testing.assert_allclose(rec[:, 1], 4.2, atol=1e-4)

    def test_validation(self):
        from vq_tpu import PerDimScalarQuantizer
        from vq_tpu.errors import DimensionMismatch, InvalidParameter

        with pytest.raises(InvalidParameter):
            PerDimScalarQuantizer([0.0, 0.0], [1.0, 0.0])  # max <= min
        with pytest.raises(InvalidParameter):
            PerDimScalarQuantizer([0.0], [1.0], levels=300)
        q = PerDimScalarQuantizer([0.0, 0.0], [1.0, 1.0])
        with pytest.raises(DimensionMismatch):
            q.quantize(np.zeros((2, 3), np.float32))

    def test_serialize(self, rng, tmp_path):
        from vq_tpu import PerDimScalarQuantizer
        from vq_tpu.utils import load, save

        x = rng.random((100, 4), dtype=np.float32)
        q = PerDimScalarQuantizer.from_data(x, levels=64)
        q2 = load(save(str(tmp_path / "pdsq"), q))
        np.testing.assert_array_equal(
            np.asarray(q.quantize(x)), np.asarray(q2.quantize(x))
        )

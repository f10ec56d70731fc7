"""BinaryQuantizer tests (reference: src/bq.rs tests + integration suites)."""

import numpy as np
import pytest

from vq_tpu import (
    BinaryQuantizer,
    InvalidParameter,
    hamming_distance,
    pack_bits,
    packed_width,
    unpack_bits,
)


class TestBasics:
    def test_basic_threshold(self):
        # reference: src/bq.rs:126-131
        bq = BinaryQuantizer(0.0, 0, 1)
        out = np.asarray(bq.quantize([-1.0, 0.0, 1.0, -0.5, 0.5]))
        np.testing.assert_array_equal(out, [0, 1, 1, 0, 1])
        assert out.dtype == np.uint8

    def test_threshold_tie_goes_high(self):
        # x >= threshold -> high (src/bq.rs:94-105)
        bq = BinaryQuantizer(0.5, 0, 1)
        np.testing.assert_array_equal(
            np.asarray(bq.quantize([0.3, 0.5, 0.7])), [0, 1, 1]
        )

    def test_nan_goes_low(self):
        # NaN >= t is false (reference tests/integration_tests.rs:477-489)
        bq = BinaryQuantizer(0.0, 0, 1)
        assert int(bq.quantize([np.nan])[0]) == 0

    def test_custom_levels(self):
        bq = BinaryQuantizer(0.0, 10, 200)
        out = np.asarray(bq.quantize([-1.0, 1.0]))
        np.testing.assert_array_equal(out, [10, 200])

    def test_dequantize(self):
        # code >= high -> float(high) else float(low) (src/bq.rs:107-118)
        bq = BinaryQuantizer(0.0, 3, 7)
        rec = np.asarray(bq.dequantize(np.array([3, 7, 0, 255], dtype=np.uint8)))
        np.testing.assert_array_equal(rec, [3.0, 7.0, 3.0, 7.0])
        assert rec.dtype == np.float32

    def test_batch_shape_preserved(self, rng):
        bq = BinaryQuantizer(0.5)
        x = rng.random((4, 6), dtype=np.float32)
        assert bq.quantize(x).shape == (4, 6)

    def test_getters_and_repr(self):
        bq = BinaryQuantizer(0.25, 1, 9)
        assert bq.threshold == pytest.approx(0.25)
        assert bq.low == 1 and bq.high == 9
        assert "BinaryQuantizer" in repr(bq)


class TestValidation:
    def test_low_ge_high_rejected(self):
        # reference: src/bq.rs:62-67
        with pytest.raises(InvalidParameter):
            BinaryQuantizer(0.0, 5, 5)
        with pytest.raises(ValueError):
            BinaryQuantizer(0.0, 6, 5)

    def test_nan_threshold_rejected(self):
        # reference: src/bq.rs:56-61
        with pytest.raises(InvalidParameter):
            BinaryQuantizer(float("nan"))

    def test_inf_threshold_rejected(self):
        with pytest.raises(InvalidParameter):
            BinaryQuantizer(float("inf"))

    def test_out_of_u8_rejected(self):
        with pytest.raises(InvalidParameter):
            BinaryQuantizer(0.0, 0, 256)


class TestBitPacking:
    def test_roundtrip(self, rng):
        bits = rng.random((5, 70)) > 0.5
        packed = np.asarray(pack_bits(bits))
        assert packed.shape == (5, packed_width(70)) == (5, 3)
        assert packed.dtype == np.uint32
        back = np.asarray(unpack_bits(packed, 70))
        np.testing.assert_array_equal(back, bits)

    def test_exact_words(self):
        bits = np.ones((2, 64), dtype=bool)
        packed = np.asarray(pack_bits(bits))
        assert packed.shape == (2, 2)
        assert (packed == 0xFFFFFFFF).all()

    def test_hamming(self):
        a = pack_bits(np.array([[1, 0, 1, 0]], dtype=bool))
        b = pack_bits(np.array([[1, 1, 1, 1], [0, 1, 0, 1]], dtype=bool))
        d = np.asarray(hamming_distance(a, b))
        np.testing.assert_array_equal(d, [[2, 4]])

    def test_hamming_matches_unpacked(self, rng):
        x = rng.random((8, 100)) > 0.5
        y = rng.random((6, 100)) > 0.5
        d = np.asarray(hamming_distance(pack_bits(x), pack_bits(y)))
        want = (x[:, None, :] != y[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d, want)

    def test_quantizer_packed_roundtrip(self, rng):
        bq = BinaryQuantizer(0.5, 0, 1)
        x = rng.random((7, 33), dtype=np.float32)
        packed = bq.quantize_packed(x)
        assert np.asarray(packed).shape == (7, 2)
        rec = np.asarray(bq.dequantize_packed(packed, 33))
        want = np.asarray(bq.dequantize(bq.quantize(x)))
        np.testing.assert_array_equal(rec, want)

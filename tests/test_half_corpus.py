"""Half-width (f16/bf16) corpus path — the TPU-native analog of the
reference's Vector<f16> (src/core/vector.rs:12-71): half input stays half
in HBM; compute upcasts per-tile to f32, so codes are identical to feeding
the same values as f32."""

import jax.numpy as jnp
import numpy as np
import pytest

from vq_tpu import ProductQuantizer
from vq_tpu.ops.kmeans import assign
from vq_tpu.search import PQIndex


@pytest.fixture(scope="module")
def half_setup(rng):
    data16 = rng.random((800, 32)).astype(np.float16)
    data32 = data16.astype(np.float32)  # exactly representable values
    q = ProductQuantizer(data32, 4, 16, max_iters=4, seed=0)
    return data16, data32, q


@pytest.mark.parametrize("dtype", ["float16", "bfloat16"])
def test_pq_encode_half_identical_codes(half_setup, dtype):
    data16, data32, q = half_setup
    half = jnp.asarray(data32).astype(dtype)  # values exact in both formats
    codes_half = np.asarray(q.encode(half))
    codes_f32 = np.asarray(q.encode(jnp.asarray(half).astype(jnp.float32)))
    np.testing.assert_array_equal(codes_half, codes_f32)


@pytest.mark.parametrize("dtype", ["float16", "bfloat16"])
def test_assign_half_identical(half_setup, dtype):
    data16, data32, q = half_setup
    c = data32[:8]
    half = jnp.asarray(data32).astype(dtype)
    codes_h, dist_h = assign(half, c)
    codes_f, dist_f = assign(jnp.asarray(half).astype(jnp.float32), c)
    np.testing.assert_array_equal(np.asarray(codes_h), np.asarray(codes_f))
    np.testing.assert_allclose(
        np.asarray(dist_h), np.asarray(dist_f), rtol=1e-5, atol=1e-5
    )


def test_pq_encode_fused_half_interpret(half_setup):
    from vq_tpu.ops.pallas_kernels import pq_encode_fused

    data16, data32, q = half_setup
    half = jnp.asarray(data32).astype(jnp.bfloat16)
    got = np.asarray(
        pq_encode_fused(half, q.codebooks, block_rows=256, interpret=True)
    )
    want = np.asarray(
        pq_encode_fused(
            jnp.asarray(half).astype(jnp.float32), q.codebooks,
            block_rows=256, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_pqindex_keeps_half_corpus(half_setup):
    data16, data32, q = half_setup
    idx = PQIndex(q, keep_corpus=True)
    idx.add(data16)
    assert idx._corpus.dtype == jnp.float16  # stored half, not upcast
    ids, dist = idx.search(data32[:4], k=3, rerank=20)
    assert np.asarray(ids)[:, 0].tolist() == [0, 1, 2, 3]  # finds self


def test_quantize_reference_path_still_f32(half_setup):
    # The reference-parity quantize (f16 centroid values out) is unchanged.
    data16, data32, q = half_setup
    out = q.quantize(data32[:5])
    assert np.asarray(out).dtype == np.float16

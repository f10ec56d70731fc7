"""Product quantization — m sub-codebooks trained with batched Lloyd's.

Reference behavior preserved (src/pq.rs):

* dim must be >= m and divisible by m (src/pq.rs:106-118).
* m independent codebooks, trained per-subspace with k-means; subspace ``i``
  gets an independent per-subspace seed (the reference uses ``seed + i``,
  src/pq.rs:130; we fold ``i`` into the PRNG key).
* **Training assignment is always squared-L2** regardless of the configured
  ``distance``; the user's distance applies only at encode time
  (src/core/vector.rs:352-363 vs src/pq.rs:184-187).
* Encode argmin ties keep the lowest index (strict ``<`` scan,
  src/pq.rs:183-191).
* ``quantize`` returns the selected centroids' values rounded to f16
  (src/pq.rs:193-195) and ``dequantize`` is the f16 -> f32 cast
  (src/pq.rs:201-209), so reconstruction MSE is directly comparable.

TPU-native extensions beyond the reference:

* ``encode``/``decode`` with true u8 code indices (``[n, m]``), the byte
  budget PQ is actually for — the reference stores f16 values and only
  reaches 50% compression (reference README.md:41).
* ADC (asymmetric distance computation): per-query ``[m, k]`` lookup tables
  and a batched top-k search over encoded corpora, computed as one-hot
  matmuls on the MXU. Supports all four metrics (cosine decomposes via
  per-subspace dot + squared-norm tables).
* All codebooks train at once: on TPU the per-iteration assignment and
  accumulation for every subspace is one fused Pallas pass over the
  interleaved data (vq_tpu/ops/pallas_kernels.py::pq_lloyd_accumulate_fused;
  ~0.5 s for 10 iterations at 1M x 128, 8x256); elsewhere ``lloyd_batched``
  vmaps the m sub-problems into batched XLA matmuls. Either way all
  subspaces train simultaneously, unlike the reference's sequential
  per-subspace loop (src/pq.rs:121-132).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vq_tpu.errors import DimensionMismatch, InvalidParameter
from vq_tpu.models.base import (
    Quantizer,
    as_batch_compute,
    as_batch_f32,
    check_training_matrix,
)
from vq_tpu.ops.distance import (
    COSINE_NORM_EPS,
    _PAIRWISE,
    Distance,
    Metric,
)
from vq_tpu.ops.kmeans import (
    CONVERGENCE_EPS,
    default_block_rows,
    lloyd_batched,
)

__all__ = ["ProductQuantizer", "pq_train", "pq_encode", "pq_decode"]


# ---------------------------------------------------------------------------
# Jitted cores (pure functions of arrays + static config).
# ---------------------------------------------------------------------------


def _subspace_scores(xs, cb, metric: Metric):
    """Distances [n, m, k] between per-subspace slices and codebooks.

    ``xs``: [n, m, s], ``cb``: [m, k, s]. For the L2 family the ``||x||^2``
    term is omitted (argmin-invariant, monotone under sqrt).
    """
    if metric in (Metric.SQUARED_EUCLIDEAN, Metric.EUCLIDEAN):
        xc = jnp.einsum(
            "nms,mks->nmk", xs, cb, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )
        cc = jnp.sum(cb * cb, axis=-1)  # [m, k]
        return cc[None] - 2.0 * xc
    if metric == Metric.COSINE:
        xc = jnp.einsum(
            "nms,mks->nmk", xs, cb, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )
        nx = jnp.sqrt(jnp.sum(xs * xs, axis=-1))  # [n, m]
        nc = jnp.sqrt(jnp.sum(cb * cb, axis=-1))  # [m, k]
        denom = jnp.maximum(nx[:, :, None] * nc[None], COSINE_NORM_EPS)
        dist = jnp.clip(1.0 - xc / denom, 0.0, 1.0)
        degenerate = (nx[:, :, None] < COSINE_NORM_EPS) | (
            nc[None] < COSINE_NORM_EPS
        )
        return jnp.where(degenerate, 1.0, dist)
    if metric == Metric.MANHATTAN:
        return jnp.sum(jnp.abs(xs[:, :, None, :] - cb[None]), axis=-1)
    raise InvalidParameter("metric", f"unsupported metric {metric}")


@functools.partial(jax.jit, static_argnames=("metric", "block_rows"))
def _pq_encode_jit(
    x: jnp.ndarray, cb: jnp.ndarray, metric: Metric, block_rows: int
) -> jnp.ndarray:
    n, d = x.shape
    m, k, s = cb.shape
    pad = (-n) % block_rows
    padded = jnp.pad(x, ((0, pad), (0, 0)))
    tiles = padded.reshape(-1, block_rows, m, s)

    def one(tile):
        # Half-width corpora upcast per-tile (the HBM array stays f16/bf16).
        scores = _subspace_scores(
            tile.astype(jnp.float32), cb, metric
        )  # [B, m, k]
        return jnp.argmin(scores, axis=-1).astype(jnp.int32)

    codes = jax.lax.map(one, tiles).reshape(-1, m)[:n]
    return codes


@functools.partial(jax.jit, static_argnames=("use_onehot",))
def _pq_decode_jit(
    codes: jnp.ndarray, cb: jnp.ndarray, use_onehot: bool = False
) -> jnp.ndarray:
    # Gather each subspace's selected centroid: [n, m] x [m, k, s] -> [n, m*s].
    n, m = codes.shape
    if use_onehot:
        # TPU: jnp.take with millions of indices into a k<=256-row table
        # lowers to a select ladder — measured 48.4 ms at 1M x 8x256 vs
        # 5.0 for one-hot HIGHEST matmuls (9.7x), BIT-EXACT: the bf16x6
        # split of an f32 is lossless (24 mantissa bits = 3 x 8) and the
        # one-hot contributes exact 1.0/0.0 products, so the gathered
        # values reconstruct exactly (verified at 1M on hardware).
        outs = []
        for i in range(m):
            ci = jnp.clip(codes[:, i], 0, cb.shape[1] - 1)  # take's clip mode
            oh = jax.nn.one_hot(ci, cb.shape[1], dtype=jnp.float32)
            outs.append(jax.lax.dot_general(
                oh, cb[i], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ))
        return jnp.concatenate(outs, axis=1)
    picked = jax.vmap(
        lambda cb_i, codes_i: jnp.take(cb_i, codes_i, axis=0),
        in_axes=(0, 1),
        out_axes=1,
    )(cb, codes)  # [n, m, s]
    return picked.reshape(n, -1)


@functools.partial(jax.jit, static_argnames=("metric",))
def _adc_tables_jit(q: jnp.ndarray, cb: jnp.ndarray, metric: Metric):
    qs = q.reshape(q.shape[0], cb.shape[0], cb.shape[2])  # [Q, m, s]
    if metric in (Metric.SQUARED_EUCLIDEAN, Metric.EUCLIDEAN):
        xc = jnp.einsum(
            "qms,mks->qmk", qs, cb, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )
        cc = jnp.sum(cb * cb, axis=-1)
        qq = jnp.sum(qs * qs, axis=-1)
        return jnp.maximum(qq[:, :, None] + cc[None] - 2.0 * xc, 0.0)
    if metric == Metric.MANHATTAN:
        return jnp.sum(jnp.abs(qs[:, :, None, :] - cb[None]), axis=-1)
    if metric == Metric.COSINE:
        # Cosine doesn't decompose per subspace directly; return the dot
        # tables — the caller combines them with per-code squared norms.
        return jnp.einsum(
            "qms,mks->qmk", qs, cb, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )
    raise InvalidParameter("metric", f"unsupported metric {metric}")


@jax.jit
def _adc_lookup_jit(tables: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """Sum per-subspace table entries for each code word.

    ``tables``: [Q, m, k], ``codes``: [n, m] -> [Q, n]. Done as m one-hot
    matmuls on the MXU (scan over subspaces) so no [Q, n, m] gather
    materializes.
    """
    q, m, k = tables.shape

    def body(acc, inp):
        table_m, codes_m = inp  # [Q, k], [n]
        onehot = jax.nn.one_hot(codes_m, k, dtype=jnp.float32)  # [n, k]
        acc = acc + jax.lax.dot_general(
            table_m, onehot, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        return acc, None

    init = jnp.zeros((q, codes.shape[0]), jnp.float32)
    acc, _ = jax.lax.scan(
        init=init,
        f=body,
        xs=(jnp.moveaxis(tables, 1, 0), codes.T),
    )
    return acc


@functools.partial(
    jax.jit, static_argnames=("metric", "fetch", "pack_bits")
)
def _adc_search_chunked_jit(
    tables: jnp.ndarray,  # [Q, m, k]
    cb_sqn: jnp.ndarray,  # [m, k] per-centroid squared norms (cosine only)
    qn: jnp.ndarray,  # [Q] query norms (cosine only)
    code_chunks: jnp.ndarray,  # [nc, chunk, m] codes ([nc, chunk, B] packed)
    nvalid: jnp.ndarray,  # [] number of real rows
    metric: Metric,
    fetch: int,
    pack_bits: int = 8,
):
    """Blockwise ADC scan with a running top-``fetch`` merge.

    Working set is one ``[Q, chunk]`` distance block; the merge is a
    ``top_k`` over ``[Q, fetch + chunk]`` per block. Avoids materializing
    the full ``[Q, n]`` matrix (512 MB HBM at Q=128, n=1M). With
    ``pack_bits < 8`` the corpus stays sub-byte-packed in HBM and each
    block is unpacked on the VPU (shift/mask, fused into the scan body).
    """
    Q = tables.shape[0]
    m = tables.shape[1]
    chunk = code_chunks.shape[1]

    def body(carry, inp):
        best_d, best_i = carry  # [Q, fetch]
        chunk_codes, cidx = inp  # [chunk, m] (or [chunk, B] packed), []
        if pack_bits < 8:
            from vq_tpu.ops.packing import _unpack_jit

            chunk_codes = _unpack_jit(chunk_codes, pack_bits, m)
        acc = _adc_lookup_jit(tables, chunk_codes)  # [Q, chunk]
        if metric == Metric.EUCLIDEAN:
            d = jnp.sqrt(jnp.maximum(acc, 0.0))
        elif metric == Metric.COSINE:
            recon_sqn = _adc_lookup_jit(cb_sqn[None], chunk_codes)[0]
            rn = jnp.sqrt(jnp.maximum(recon_sqn, 0.0))
            denom = jnp.maximum(qn[:, None] * rn[None, :], COSINE_NORM_EPS)
            d = jnp.clip(1.0 - acc / denom, 0.0, 1.0)
            degenerate = (qn[:, None] < COSINE_NORM_EPS) | (
                rn[None, :] < COSINE_NORM_EPS
            )
            d = jnp.where(degenerate, 1.0, d)
        else:
            d = acc
        gidx = cidx * chunk + jnp.arange(chunk)
        d = jnp.where((gidx < nvalid)[None, :], d, jnp.inf)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(gidx[None, :], (Q, chunk))], axis=1
        )
        neg, pos = jax.lax.top_k(-cat_d, fetch)
        return (-neg, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (
        jnp.full((Q, fetch), jnp.inf, jnp.float32),
        jnp.full((Q, fetch), -1, jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        body, init, (code_chunks, jnp.arange(code_chunks.shape[0]))
    )
    return best_i, best_d


@functools.partial(
    jax.jit,
    static_argnames=("fetch", "metric", "pack_bits", "interpret"),
)
def _adc_search_fused_jit(
    tables: jnp.ndarray,  # [Q, m, k] f32
    codes: jnp.ndarray,  # [n, m] u8 ([n, B] when pack_bits < 8)
    fetch: int,
    metric: Metric,
    pack_bits: int = 8,
    interpret: bool = False,
):
    """Flat ADC top-``fetch`` via the VMEM-resident scan+top-k kernel.

    The distance matrix never touches HBM: the kernel emits per-tile
    top-``fetch`` candidates and ONE stable ``top_k`` merges them
    (2.27× the XLA chunked scan's device time at 1M×8×256 —
    docs/performance.md). Distances are bit-identical to the XLA
    chunked scan (same per-element f32 summation order) and exact ties
    resolve to the lowest global id in both, so returned ids match
    exactly (verified at 1M rows on hardware).
    """
    from vq_tpu.ops.pallas_kernels import adc_scan_topk_fused

    codes_t = codes.astype(jnp.uint8).T  # [m|B, n], lane-contiguous
    vals, ids = adc_scan_topk_fused(
        tables, codes_t, fetch, pack_bits=pack_bits,
        interpret=interpret,
    )
    neg, pos = jax.lax.top_k(-vals, fetch)
    dist = -neg
    idx = jnp.take_along_axis(ids, pos, axis=1)
    idx = jnp.where(jnp.isinf(dist), -1, idx)
    if metric == Metric.EUCLIDEAN:
        dist = jnp.sqrt(jnp.maximum(dist, 0.0))
    return idx, dist


def _adc_lookup_best(tables: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """ADC table-sum entry point. Measured on TPU (Q=128, n=1M, 8x256):
    the XLA scan (41 ms) slightly beats the fused Pallas kernel (48 ms,
    vq_tpu.ops.pallas_kernels.adc_lookup_fused) — XLA fuses the one-hot
    into the matmul without materializing it — so the scan is used on every
    backend. The Pallas kernel remains available for direct use."""
    return _adc_lookup_jit(tables, codes)


def pq_encode_best(
    x: jnp.ndarray, cb: jnp.ndarray, metric: Metric, block_rows: int
) -> jnp.ndarray:
    """Fastest available encode path for the current backend.

    On TPU with squared-L2-family metrics this is the fused Pallas
    distance+argmin kernel (vq_tpu/ops/pallas_kernels.py) — codebooks stay
    resident in VMEM across data tiles. Other backends/metrics use the
    XLA-fused path. Both produce identical codes (ties break to the lowest
    index in either path).
    """
    if metric in (Metric.SQUARED_EUCLIDEAN, Metric.EUCLIDEAN) and (
        jax.default_backend() == "tpu"
    ):
        from vq_tpu.ops.pallas_kernels import pq_encode_fused

        # 768-row tiles measured fastest on v5e (sweep in docs/performance.md).
        return pq_encode_fused(x, cb, block_rows=min(block_rows, 768))
    return _pq_encode_jit(x, cb, metric, block_rows)


# ---------------------------------------------------------------------------
# Functional API.
# ---------------------------------------------------------------------------


def pq_train(
    training_data,
    num_subspaces: int,
    num_centroids: int,
    max_iters: int = 10,
    seed: int = 42,
    *,
    block_rows: Optional[int] = None,
    use_pallas: Optional[bool] = None,
    init_codebooks=None,
) -> jnp.ndarray:
    """Train PQ codebooks; returns ``[m, k, sub_dim]`` f32.

    Validation matches the reference ctor (src/pq.rs:91-118). On TPU the
    per-iteration assignment+accumulate for all m subspaces runs as one
    fused Pallas pass (one HBM read of the data per Lloyd iteration);
    elsewhere the vmapped XLA path is used. Same per-subspace key streams
    and update rule either way — results coincide up to f32 summation
    order.
    """
    data = check_training_matrix(training_data)
    n, dim = data.shape
    m = int(num_subspaces)
    k = int(num_centroids)
    if m <= 0:
        raise InvalidParameter("num_subspaces", "must be greater than 0")
    if dim < m:
        raise InvalidParameter(
            "num_subspaces", f"must be at most the data dimension ({dim})"
        )
    if dim % m != 0:
        raise InvalidParameter(
            "num_subspaces", f"dimension ({dim}) must be divisible by m"
        )
    sub = dim // m
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from vq_tpu.ops.pallas_kernels import pq_fused_block_cap

        if pq_fused_block_cap(m, k, sub) <= 0:
            use_pallas = False  # VMEM budget: keep the XLA accumulate
    if use_pallas and n >= k:
        from vq_tpu.ops.kmeans import _pq_lloyd_fused_jit, _validate_kmeans_args

        _validate_kmeans_args(n, k, int(max_iters))
        base = jax.random.PRNGKey(int(seed))
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(m))
        has_init = init_codebooks is not None
        init = (
            jnp.asarray(init_codebooks, jnp.float32) if has_init
            else jnp.zeros((m, k, sub), jnp.float32)
        )
        codebooks, _iters, _conv = _pq_lloyd_fused_jit(
            data, keys, k, int(max_iters), float(CONVERGENCE_EPS),
            min(int(block_rows) if block_rows else 1024, 1024),
            init, has_init,
        )
        return codebooks
    # [n, d] -> [m, n, sub]: each subspace trains on its column block
    # (reference slices per-vector copies, src/pq.rs:121-129; here it's a
    # reshape+transpose XLA handles as a layout change).
    per_subspace = jnp.moveaxis(data.reshape(n, m, sub), 1, 0)
    codebooks, _iters, _conv = lloyd_batched(
        per_subspace, k, max_iters=max_iters, seed=seed,
        block_rows=block_rows, init_centroids=init_codebooks,
    )
    return codebooks


@functools.partial(jax.jit, static_argnames=("precision", "tile"))
def _pq_encode_mpacked_jit(
    x: jnp.ndarray, cb: jnp.ndarray, precision, tile: int = 8192
) -> jnp.ndarray:
    """m-packed encode: ONE dense ``[tile, d] x [d, m*k]`` block-diagonal
    matmul per tile + per-subspace argmin (lowest-index ties).

    The point is the PRECISION ladder, not the layout: the dense form
    lets XLA run the contraction at the chip's single-pass bf16 rate
    (measured 512 TFLOP/s vs 34.5 at HIGHEST, round-4 recalibration —
    benchmarks/roofline_chain.py), which the per-subspace [tile, s=16]
    contraction cannot reach (Mosaic's lower-precision paths measured
    4x SLOWER in-kernel; benchmarks/mpacked_encode.py). Measured at
    1M x 128 8x256 scan-chained device time vs the shipped HIGHEST
    kernel's 17.1 ms: DEFAULT (1-pass bf16, sliced int1 epilogue,
    round-5 rework) 4.0 ms with ~98.4% code match, HIGH (bf16x3)
    13.2 ms with 99.995% — near-tie argmin flips only, no measurable
    MSE/recall change (docs/performance.md quality table). At HIGHEST
    this layout is a wash (equal MAC count — both sit at the dense f32
    roofline with 8x structural waste), so exact encodes keep the
    Pallas kernel.
    """
    n, d = x.shape
    m, k, s = cb.shape
    # Block-diagonal W = [-2 c^T] built at trace time (m is static).
    W = jnp.zeros((d, m * k), jnp.float32)
    for i in range(m):
        W = W.at[i * s:(i + 1) * s, i * k:(i + 1) * k].set(
            -2.0 * cb[i].T
        )
    ccb = jnp.sum(cb * cb, axis=-1).reshape(-1)  # [m*k]
    fast = precision == jax.lax.Precision.DEFAULT
    if fast:
        W = W.astype(jnp.bfloat16)
        precision = None  # single-pass native bf16
    tile = min(tile, _round_up_rows(n))
    idx_bits = max((k - 1).bit_length(), 1)

    def one(tl):
        if fast:
            # Cast per-tile INSIDE the scanned body: it fuses into the
            # matmul's VMEM read, so no [n, d] bf16 copy of the corpus
            # is ever materialized (the round-5 isolation priced that
            # prep pass at ~1.25 ms of the 1M x 128 encode's 5.9).
            tl = tl.astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            tl, W, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) + ccb[None, :]
        if fast:
            # Packed single-reduce argmin ("int1") over 2D COLUMN SLICES:
            # the index rides the orderable key's low bits, so ONE i32
            # min replaces XLA's variadic argmin reduce, and keeping the
            # epilogue 2D (per-subspace slice of the [tile, m*k] scores,
            # never a 3D reshape) lets it fuse with the dot instead of
            # spilling the scores block to HBM — the round-5
            # decomposition priced the 3D-reshape epilogue at +3.0 ms
            # and the sliced int1 form at +1.3 over the matmul alone.
            # Dropping idx_bits mantissa bits from the comparison adds
            # ~5e-4 near-tie flips, 30x below this mode's own ~1.6e-2
            # flip rate vs exact (docs/performance.md quality table).
            from vq_tpu.ops.pallas_kernels import _orderable_key

            col = jax.lax.broadcasted_iota(jnp.int32, (tile, k), 1)
            lo = jnp.int32((1 << idx_bits) - 1)
            outs = []
            for i in range(m):
                key = _orderable_key(scores[:, i * k:(i + 1) * k])
                packed = jax.lax.bitwise_and(key, ~lo) | col
                outs.append(
                    jax.lax.bitwise_and(jnp.min(packed, axis=-1), lo)
                )
            return jnp.stack(outs, axis=-1)
        return jnp.argmin(
            scores.reshape(tile, m, k), axis=-1
        ).astype(jnp.int32)

    # Plain scan (unroll=1): at tile 8192 the 123-step loop's ~10 us/step
    # scheduling overhead is already amortized; unroll=2/4 measured
    # SLOWER here (4.04 -> 4.45 / 5.91 ms — register/VMEM pressure).
    def step(c, tl):
        return c, one(tl)

    # Bulk tiles scan over CONTIGUOUS SLICES of x (reshape of a prefix
    # slice is a layout no-op) — padding the whole corpus to a tile
    # multiple would copy all n rows just to add a few. Fast mode
    # prefers a nearby tile that divides n exactly: the remainder
    # path's codes concatenate costs ~0.7 ms at 1M x 128
    # (layout-inflated [n, m] copy, round-5 ablation), so e.g. n=1M
    # runs at tile 8000, zero remainder. The exact modes keep the
    # requested power-of-two tile — their 3D-reshape argmin hits
    # pathological codegen at odd tiles (81 ms vs 13.2 at 1M HIGH,
    # round-5 artifact; the 2D-sliced exact argmin measured 17.9, so
    # 3D + remainder concat stays the exact-mode optimum).
    if fast and n > tile:
        for t in range(tile, tile // 2, -8):
            if n % t == 0:
                tile = t
                break
    n_bulk = (n // tile) * tile
    parts = []
    if n_bulk:
        _, bulk = jax.lax.scan(
            step, jnp.int32(0), x[:n_bulk].reshape(-1, tile, d)
        )
        parts.append(bulk.reshape(n_bulk, m))
    if n_bulk < n:
        rem = jnp.pad(x[n_bulk:], ((0, tile - (n - n_bulk)), (0, 0)))
        parts.append(one(rem)[: n - n_bulk])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


def _round_up_rows(n: int) -> int:
    return -(-n // 8) * 8


_ENCODE_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "bf16x3": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
    "bf16_fast": jax.lax.Precision.DEFAULT,
}


def pq_encode(
    x, codebooks, metric: Metric | str = Metric.EUCLIDEAN,
    block_rows: Optional[int] = None,
    precision: str = "highest",
) -> jnp.ndarray:
    """Encode ``[n, d]`` vectors to ``[n, m]`` int32 code indices.

    ``precision`` selects the speed/exactness trade (TPU, L2 metrics):

    * ``"highest"`` (default) — bit-exact vs the CPU oracle; the fused
      Pallas kernel (17.1 ms device / 1M x 128 8x256).
    * ``"high"`` / ``"bf16x3"`` — 3-pass bf16 m-packed (13.2 ms, 1.30x;
      99.995% identical codes, near-tie flips only).
    * ``"default"`` / ``"bf16_fast"`` — single-pass bf16 m-packed
      (6.25 ms, 2.74x; 98.4% identical codes, no measurable MSE or
      recall change — docs/performance.md quality table).
    """
    metric = Metric.parse(metric)
    cb = jnp.asarray(codebooks, jnp.float32)
    x2d, _ = as_batch_compute(x)  # f16/bf16 corpora stay half in HBM
    m, k, s = cb.shape
    if x2d.shape[1] != m * s:
        raise DimensionMismatch(expected=m * s, found=x2d.shape[1])
    if precision not in _ENCODE_PRECISIONS:
        raise InvalidParameter(
            "precision",
            f"must be one of {sorted(_ENCODE_PRECISIONS)}",
        )
    if precision != "highest" and metric in (
        Metric.SQUARED_EUCLIDEAN, Metric.EUCLIDEAN
    ):
        return _pq_encode_mpacked_jit(
            x2d.astype(jnp.float32), cb, _ENCODE_PRECISIONS[precision]
        )
    if block_rows is None:
        block_rows = default_block_rows(x2d.shape[0], k * m, s)
    # Single entry point like the reference (src/pq.rs:167-199): every
    # caller — ProductQuantizer.encode, PQIndex.add, the eval CLIs — gets
    # the fastest backend path (fused Pallas kernel on TPU for L2 metrics).
    return pq_encode_best(x2d, cb, metric, int(block_rows))


def pq_decode(codes, codebooks) -> jnp.ndarray:
    """Decode ``[n, m]`` code indices back to ``[n, d]`` f32 centroid values."""
    cb = jnp.asarray(codebooks, jnp.float32)
    codes = jnp.asarray(codes)
    if codes.ndim == 1:
        codes = codes[None, :]
    if codes.shape[1] != cb.shape[0]:
        raise DimensionMismatch(expected=cb.shape[0], found=codes.shape[1])
    return _pq_decode_jit(
        codes.astype(jnp.int32), cb,
        # One-hot operands materialize [n, k]: cap k like pick_rows does
        # (past it the take ladder is the lesser cost).
        use_onehot=(
            jax.default_backend() == "tpu" and cb.shape[1] <= 4096
        ),
    )


class ProductQuantizer(Quantizer):
    """Product quantizer with m sub-codebooks (reference: src/pq.rs).

    Constructor signature follows pyvq (pyvq/src/pq.rs:48-57):
    ``ProductQuantizer(training_data, num_subspaces, num_centroids,
    max_iters=10, distance=None, seed=42)`` with ``distance`` defaulting to
    Euclidean. ``codebooks`` may be passed directly (e.g. from a checkpoint)
    to skip training.

    >>> import numpy as np
    >>> data = np.tile(
    ...     np.array([[0., 0., 1., 1.], [1., 1., 0., 0.]], np.float32),
    ...     (8, 1),
    ... )
    >>> pq = ProductQuantizer(data, num_subspaces=2, num_centroids=2)
    >>> pq.codebooks.shape  # [m, k, sub_dim]
    (2, 2, 2)
    >>> codes = pq.encode(data)  # true u8 code indices
    >>> codes.shape, str(codes.dtype)
    ((16, 2), 'uint8')
    >>> bool(np.allclose(pq.decode(codes), data))
    True
    """

    def __init__(
        self,
        training_data=None,
        num_subspaces: int = None,
        num_centroids: int = None,
        max_iters: int = 10,
        distance=None,
        seed: int = 42,
        *,
        codebooks=None,
        block_rows: Optional[int] = None,
    ):
        if isinstance(distance, Distance):
            self._metric = distance.metric
        else:
            self._metric = Metric.parse(distance)
        if codebooks is not None:
            cb = jnp.asarray(codebooks, jnp.float32)
            if cb.ndim != 3:
                raise InvalidParameter(
                    "codebooks", f"must be [m, k, sub_dim], got {cb.ndim}-D"
                )
            self._codebooks = cb
        else:
            if training_data is None:
                raise InvalidParameter(
                    "training_data", "required when codebooks are not given"
                )
            if num_subspaces is None or num_centroids is None:
                raise InvalidParameter(
                    "num_subspaces/num_centroids",
                    "required when training from data",
                )
            self._codebooks = pq_train(
                training_data,
                num_subspaces,
                num_centroids,
                max_iters=max_iters,
                seed=seed,
                block_rows=block_rows,
            )
        self._block_rows = block_rows

    # -- introspection (reference getters, src/pq.rs:143-162) ---------------

    @property
    def codebooks(self) -> jnp.ndarray:
        """Trained codebooks, ``[m, k, sub_dim]`` f32."""
        return self._codebooks

    @property
    def num_subspaces(self) -> int:
        return self._codebooks.shape[0]

    @property
    def num_centroids(self) -> int:
        return self._codebooks.shape[1]

    @property
    def sub_dim(self) -> int:
        return self._codebooks.shape[2]

    @property
    def dim(self) -> int:
        return self.num_subspaces * self.sub_dim

    @property
    def distance_metric(self) -> str:
        return self._metric.value

    @property
    def distance(self) -> Distance:
        return Distance(self._metric)

    # -- code-index API (TPU-native; true u8 storage) -----------------------

    def encode(self, x, precision: str = "highest") -> jnp.ndarray:
        """``[n, d]`` (or ``[d]``) -> ``[n, m]`` (or ``[m]``) code indices.

        Returned as uint8 when ``k <= 256`` — the actual PQ byte budget.
        f16/bf16 input stays half-width in HBM (codes identical to f32
        input of the same values; reference ``Vector<f16>`` analog).
        ``precision``: see :func:`pq_encode` — ``"high"``/``"default"``
        opt into the 1.3x/2.7x m-packed bf16 encodes.
        """
        x2d, was_1d = as_batch_compute(x)
        codes = pq_encode(
            x2d, self._codebooks, self._metric, self._block_rows,
            precision=precision,
        )
        if self.num_centroids <= 256:
            codes = codes.astype(jnp.uint8)
        if was_1d:
            codes = codes[0]
        return codes

    def decode(self, codes) -> jnp.ndarray:
        """Inverse of :meth:`encode` -> f32 reconstruction ``[n, d]``."""
        codes = jnp.asarray(codes)
        was_1d = codes.ndim == 1
        out = pq_decode(codes, self._codebooks)
        return out[0] if was_1d else out

    # -- reference-compatible API (f16 centroid values) ---------------------

    def quantize(self, x) -> jnp.ndarray:
        """Reference-parity quantize: emit selected centroids as f16
        (src/pq.rs:167-199). Accepts ``[d]`` or ``[n, d]``."""
        x2d, was_1d = as_batch_f32(x)
        if x2d.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x2d.shape[1])
        recon = self.decode(self.encode(x2d)).astype(jnp.float16)
        return recon[0] if was_1d else recon

    def dequantize(self, quantized) -> jnp.ndarray:
        """f16 -> f32 cast with a dim check (src/pq.rs:201-209)."""
        q = jnp.asarray(quantized)
        d = q.shape[-1] if q.ndim else 0
        if d != self.dim:
            raise DimensionMismatch(expected=self.dim, found=d)
        return q.astype(jnp.float32)

    # -- ADC search ---------------------------------------------------------

    def adc_tables(self, queries) -> jnp.ndarray:
        """Per-query lookup tables ``[Q, m, k]`` under this PQ's metric.

        For the L2 family entries are per-subspace squared distances (their
        sum over m is the full squared distance); for Manhattan, per-subspace
        L1 distances; for cosine, per-subspace dots (combined with code norms
        in :meth:`adc_search`).
        """
        q2d, _ = as_batch_f32(queries)
        if q2d.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=q2d.shape[1])
        return _adc_tables_jit(q2d, self._codebooks, self._metric)

    def adc_distances(self, queries, codes, *, pack_bits: int = 8) -> jnp.ndarray:
        """Asymmetric distances ``[Q, n]`` between raw queries and encoded
        corpus ``codes [n, m]``, without decoding the corpus. With
        ``pack_bits < 8``, ``codes`` is the sub-byte-packed layout from
        :func:`vq_tpu.ops.packing.pack_codes`."""
        q2d, _ = as_batch_f32(queries)
        codes = jnp.asarray(codes)
        if codes.ndim == 1:
            codes = codes[None, :]
        if pack_bits < 8:
            from vq_tpu.ops.packing import unpack_codes

            codes = unpack_codes(codes, pack_bits, self.num_subspaces)
        codes = codes.astype(jnp.int32)
        tables = self.adc_tables(q2d)
        acc = _adc_lookup_best(tables, codes)
        if self._metric == Metric.EUCLIDEAN:
            return jnp.sqrt(jnp.maximum(acc, 0.0))
        if self._metric == Metric.COSINE:
            # 1 - dot / (|q| * |recon|); |recon|^2 decomposes over subspaces.
            sqn_tables = jnp.sum(
                self._codebooks * self._codebooks, axis=-1
            )  # [m, k]
            recon_sqn = _adc_lookup_best(
                sqn_tables[None], codes
            )[0]  # [n]
            qn = jnp.sqrt(jnp.sum(q2d * q2d, axis=-1))  # [Q]
            rn = jnp.sqrt(jnp.maximum(recon_sqn, 0.0))  # [n]
            denom = jnp.maximum(qn[:, None] * rn[None, :], COSINE_NORM_EPS)
            dist = jnp.clip(1.0 - acc / denom, 0.0, 1.0)
            degenerate = (qn[:, None] < COSINE_NORM_EPS) | (
                rn[None, :] < COSINE_NORM_EPS
            )
            return jnp.where(degenerate, 1.0, dist)
        return acc

    def adc_search(self, queries, codes, k: int = 10, *, rerank: int = 0,
                   corpus=None, chunk: int = 262_144, pack_bits: int = 8):
        """Top-k nearest codes for each query by asymmetric distance.

        Returns ``(indices [Q, k], distances [Q, k])`` sorted ascending.

        With ``rerank=R > 0`` and the original ``corpus`` rows provided, a
        top-R ADC shortlist is re-scored with exact distances under this
        quantizer's metric (standard two-stage ANN search — recovers the
        recall that quantization error costs at large corpus sizes for the
        price of R exact distance computations per query).

        Corpora longer than ``chunk`` are scanned blockwise with a running
        top-k merge, so the working set is ``[Q, chunk]`` instead of the
        full ``[Q, n]`` distance matrix (512 MB of HBM at Q=128, n=1M).
        """
        codes_arr = jnp.asarray(codes)
        n = codes_arr.shape[0]
        fetch = max(int(k), int(rerank)) if rerank else int(k)
        q2d, _ = as_batch_f32(queries)
        from vq_tpu.ops.pallas_kernels import adc_topk_max_block

        fused_ok = (
            jax.default_backend() == "tpu"
            and int(pack_bits) in (1, 2, 4, 8)
            and self.num_centroids <= 256
            and self._metric in (
                Metric.SQUARED_EUCLIDEAN, Metric.EUCLIDEAN,
                Metric.MANHATTAN,
            )
            and 1 <= fetch <= 128
            # Full kernel VMEM gate: Q AND the persistent [m, kh, q, 128]
            # table scratch must fit the proven budget together.
            and adc_topk_max_block(
                q2d.shape[0], self.num_subspaces, self.num_centroids
            ) > 0
            and n > 32_768
            and fetch < n
        )
        if fused_ok:
            d = None
            if q2d.shape[1] != self.dim:
                raise DimensionMismatch(
                    expected=self.dim, found=q2d.shape[1]
                )
            tables = _adc_tables_jit(q2d, self._codebooks, self._metric)
            ids, dist = _adc_search_fused_jit(
                tables, codes_arr, fetch, self._metric,
                pack_bits=int(pack_bits),
            )
        elif n > int(chunk) and fetch < n:
            d = None
            ids, dist = self._adc_search_chunked(
                queries, codes_arr, min(fetch, n), int(chunk),
                pack_bits=int(pack_bits),
            )
        else:
            d = self.adc_distances(queries, codes, pack_bits=int(pack_bits))
            ids = dist = None
        if d is None and not rerank:
            return ids[:, :k], dist[:, :k]
        if d is None and rerank:
            # Chunked shortlist: re-score exactly below.
            short, _ = ids, dist
            if corpus is not None:
                q2d, _ = as_batch_f32(queries)
                cand = jnp.take(jnp.asarray(corpus), short, axis=0).astype(
                    jnp.float32
                )
                exact = jax.vmap(
                    lambda qv, cv: _PAIRWISE[self._metric](qv[None, :], cv)[0]
                )(q2d, cand)
                neg_top, pos = jax.lax.top_k(-exact, min(k, short.shape[1]))
                return jnp.take_along_axis(short, pos, axis=1), -neg_top
            return short[:, :k], dist[:, :k]
        if rerank and corpus is not None:
            r = min(int(rerank), d.shape[1])
            _, short = jax.lax.top_k(-d, r)  # [Q, R] candidate ids
            q2d, _ = as_batch_f32(queries)
            # Gather candidates first, THEN upcast — a half-width corpus
            # must not be materialized as a full f32 copy at search time.
            cand = jnp.take(jnp.asarray(corpus), short, axis=0).astype(
                jnp.float32
            )  # [Q, R, d]
            exact = jax.vmap(
                lambda qv, cv: _PAIRWISE[self._metric](qv[None, :], cv)[0]
            )(q2d, cand)  # [Q, R]
            neg_top, pos = jax.lax.top_k(-exact, min(k, r))
            idx = jnp.take_along_axis(short, pos, axis=1)
            return idx, -neg_top
        neg_top, idx = jax.lax.top_k(-d, k)
        return idx, -neg_top

    def _adc_search_chunked(
        self, queries, codes, fetch: int, chunk: int, *, pack_bits: int = 8
    ):
        """Driver for :func:`_adc_search_chunked_jit`: builds tables and
        the padded ``[nc, chunk, m]`` code blocks (``[nc, chunk, B]`` when
        the corpus is sub-byte-packed — blocks unpack in the scan body)."""
        q2d, _ = as_batch_f32(queries)
        if q2d.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=q2d.shape[1])
        tables = _adc_tables_jit(q2d, self._codebooks, self._metric)
        codes = jnp.asarray(codes)
        codes = (
            codes.astype(jnp.uint8) if pack_bits < 8
            else codes.astype(jnp.int32)
        )
        n, width = codes.shape
        pad = (-n) % chunk
        code_chunks = jnp.pad(codes, ((0, pad), (0, 0))).reshape(
            -1, chunk, width
        )
        cb_sqn = jnp.sum(self._codebooks * self._codebooks, axis=-1)
        qn = jnp.sqrt(jnp.sum(q2d * q2d, axis=-1))
        return _adc_search_chunked_jit(
            tables, cb_sqn, qn, code_chunks, jnp.int32(n), self._metric,
            int(fetch), int(pack_bits),
        )

    def __repr__(self) -> str:
        return (
            f"ProductQuantizer(m={self.num_subspaces}, k={self.num_centroids}, "
            f"sub_dim={self.sub_dim}, distance={self._metric.value!r})"
        )

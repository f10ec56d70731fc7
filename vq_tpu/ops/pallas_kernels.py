"""Fused Pallas TPU kernels for the hot paths.

The north star (BASELINE.json) calls for Lloyd's assignment as a *fused*
distance-matmul + argmin kernel: distances go MXU -> VMEM -> argmin on the
VPU without the ``[tile, k]`` score matrix ever reaching HBM, and the
per-cluster ``(sum, count)`` accumulators build up in VMEM across the data
tiles of one grid pass. These kernels are the TPU-native replacement for the
reference's two hot loops:

* k-means assignment (reference src/core/vector.rs:417-429, Rayon-parallel
  scalar scan) -> :func:`assign_fused` / :func:`lloyd_accumulate_fused`.
* PQ encode (reference src/pq.rs:177-196, per-subspace linear scan over
  centroids through the hsdlib C FFI) -> :func:`pq_encode_fused`.

Tie-breaking: every kernel argmin goes through :func:`_int_argmin` mode
``"int2"`` (orderable-int key min + lowest-index-among-minima), which is
both faster than Mosaic's variadic argmin and the only lowering that
matches the reference's strict ``<`` scans exactly on ties
(src/core/vector.rs:352-363, src/pq.rs:183-191) — Mosaic's native argmin
was measured breaking exact ties to a non-lowest index. The k-tiled merge
in the assignment kernels preserves lowest-index with strict ``<`` on the
running minimum.

All kernels compute scores as ``||c||^2 - 2 x.c^T`` in f32 (the ``||x||^2``
term is argmin-invariant); inertia adds the ``||x||^2`` term back at the
end. f32 (not bf16) keeps assignments from flipping near ties (SURVEY.md
§7.3).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "assign_fused",
    "assign_block_cap",
    "pq_encode_fused",
    "lloyd_accumulate_fused",
    "pq_lloyd_accumulate_fused",
    "pq_fused_block_cap",
    "adc_lookup_fused",
    "adc_scan_topk_fused",
    "adc_topk_max_block",
    "ivf_probe_adc_fused",
    "ivf_probe_matvec_fused",
]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# Fused nearest-centroid assignment: data [n, d] x centroids [k, d]
#   -> codes [n] i32, sqdist [n] f32
# ---------------------------------------------------------------------------


# All in-kernel matmuls run at HIGHEST precision: the MXU's default f32
# handling truncates inputs to bf16, which flips argmins near ties and
# breaks exact-code parity with the XLA path (SURVEY.md §7.3).
_PRECISION = jax.lax.Precision.HIGHEST


def _orderable_key(scores):
    """Monotone f32 -> i32 bijection: integer order == float order.

    Standard sign-flip trick (involution): non-negative floats keep their
    bit pattern, negative floats flip the low 31 bits. NaN maps to a large
    positive key, so NaN scores never win a min — matching the reference's
    strict ``<`` scans, where ``NaN < best`` is always false
    (src/pq.rs:187, src/core/vector.rs:352-363).
    """
    b = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = jnp.where(b < 0, b ^ jnp.int32(0x7FFFFFFF), b)
    # -0.0 (bits 0x80000000) keys to -1, one below +0.0's key — but IEEE
    # compares them EQUAL, and equal scores must resolve to the lowest
    # index. Canonicalize -0.0 onto +0.0's key.
    return jnp.where(key == jnp.int32(-1), jnp.int32(0), key)


def _key_to_f32(key):
    """Inverse of :func:`_orderable_key` (it is an involution)."""
    return jax.lax.bitcast_convert_type(
        jnp.where(key < 0, key ^ jnp.int32(0x7FFFFFFF), key), jnp.float32
    )


def _int_argmin(scores, col, mode: str):
    """(min_score f32, argmin i32) over the last axis via integer min-reduces.

    ``mode``:

    * ``"reduce"`` — plain ``jnp.min`` + ``jnp.argmin`` (variadic reduce).
    * ``"int2"`` — EXACT: orderable-int key min (1 plain i32 reduce), then
      lowest index among exact key minima (1 more i32 reduce over a fused
      select). Bit-identical argmin to ``"reduce"`` on non-NaN input, and
      NaN-safer (NaN never wins, like the reference's ``<`` scan).
    * ``"int1"`` — FAST: pack ``(key & ~(idx_mask)) | index`` and do ONE i32
      min-reduce. Drops the low index-width mantissa bits from the
      comparison, so two scores within ~2^-24+log2(k) relative may tie and
      resolve to the lower index — not bit-exact near ties.

    ``col`` is the broadcasted index iota of ``scores``'s shape.
    """
    if mode == "reduce":
        return (
            jnp.min(scores, axis=-1),
            jnp.argmin(scores, axis=-1).astype(jnp.int32),
        )
    key = _orderable_key(scores)
    if mode == "int2":
        mkey = jnp.min(key, axis=-1, keepdims=True)
        idx = jnp.min(
            jnp.where(key == mkey, col, jnp.int32(0x7FFFFFFF)), axis=-1
        )
        return _key_to_f32(mkey[..., 0]), idx
    if mode == "int1":
        k = scores.shape[-1]
        bits = max(1, (k - 1).bit_length())
        mask = jnp.int32(~((1 << bits) - 1))
        packed = jnp.min((key & mask) | col, axis=-1)
        return _key_to_f32(packed & mask), packed & jnp.int32((1 << bits) - 1)
    raise ValueError(f"unknown argmin mode {mode!r}")


def _assign_kernel(
    x_ref, c_ref, cc_ref, codes_ref, dist_ref, *, k_tile, k_total, clamp
):
    """One [TN, d] data tile against all centroids, k-tiled in VMEM.

    Scores stream through VMEM; the running (min, argmin) merge keeps the
    lowest index on ties via strict ``<``. ``clamp=False`` emits the raw
    ``min + ||x||^2`` (no max-with-0) so the k-chunked caller can merge
    chunk minima without clamping-induced ties (two chunks whose true
    scores differ below zero would both clamp to 0 and the merge would
    lose the real winner).
    """
    x = x_ref[:].astype(jnp.float32)  # [TN, d]; upcast half corpora per-tile
    tn = x.shape[0]
    num_k_tiles = k_total // k_tile
    col = jax.lax.broadcasted_iota(jnp.int32, (tn, k_tile), 1)

    run_min = jnp.full((tn,), jnp.inf, jnp.float32)
    run_idx = jnp.zeros((tn,), jnp.int32)
    for t in range(num_k_tiles):  # static unroll: k_total/k_tile is small
        c = c_ref[pl.ds(t * k_tile, k_tile), :]  # [TK, d]
        cc = cc_ref[0, pl.ds(t * k_tile, k_tile)]  # [TK]
        xc = jax.lax.dot_general(
            x, c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION,
        )  # [TN, TK] on the MXU
        # int2: integer-key argmin — faster than Mosaic's variadic reduce
        # AND the only lowering that honors lowest-index ties exactly.
        tile_min, tile_idx = _int_argmin(cc[None, :] - 2.0 * xc, col, "int2")
        better = tile_min < run_min  # strict: earlier tile wins ties
        run_idx = jnp.where(better, tile_idx + t * k_tile, run_idx)
        run_min = jnp.where(better, tile_min, run_min)

    xx = jnp.sum(x * x, axis=-1)
    # Outputs are [n, 1] column vectors: 1-D blocks trip Mosaic/XLA layout
    # tiling mismatches for s32, and (1, TN) blocks violate the sublane
    # divisibility rule; (TN, 1) satisfies both.
    codes_ref[:, 0] = run_idx
    raw = run_min + xx
    dist_ref[:, 0] = jnp.maximum(raw, 0.0) if clamp else raw


@functools.partial(
    jax.jit, static_argnames=("block_rows", "interpret", "clamp")
)
def _assign_fused_jit(
    data, centroids, block_rows: int, interpret: bool, clamp: bool = True
):
    n, d = data.shape
    k = centroids.shape[0]
    # Pad k to a lane-aligned tile; padded centroids sit at +inf distance.
    k_tile = min(_round_up(k, 128), 512)
    k_pad = _round_up(k, k_tile)
    c = jnp.pad(centroids, ((0, k_pad - k), (0, 0)))
    cc = jnp.sum(c * c, axis=-1)
    # Padded (zero) centroids must never win: push their score to +inf.
    cc = jnp.where(jnp.arange(k_pad) < k, cc, jnp.inf)[None, :]  # [1, k_pad]

    n_pad = _round_up(n, block_rows)
    x = jnp.pad(data, ((0, n_pad - n), (0, 0)))

    nb = n_pad // block_rows
    codes, dists = pl.pallas_call(
        functools.partial(
            _assign_kernel, k_tile=k_tile, k_total=k_pad, clamp=clamp
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, c, cc)
    return codes[:n, 0], dists[:n, 0]


def _assign_resident_cap(k: int, d: int) -> int:
    """Largest safe data-tile height with the WHOLE codebook VMEM-resident.

    The resident centroids block is ``k_pad·d·4`` B and the statically
    unrolled k-tile loop keeps ~3-4 live ``[TN, 512]`` f32 temporaries
    per 512-lane k-tile (measured: TN=1024 at k=4096, d=128 hit
    16.34 MB scoped VMEM — 348 KB over the limit — during the round-4
    8M-row IVF build). Returns 0 when no tile fits; large-k callers go
    through the k-chunked dispatch instead (see :func:`assign_block_cap`).
    Same budget-discipline family as :func:`adc_topk_max_block` /
    :func:`pq_fused_block_cap`.
    """
    k_pad = _round_up(max(int(k), 128), 128)
    fixed = k_pad * d * 4 + k_pad * 4
    budget = 15 * 1024 * 1024 - fixed
    if budget <= 0:
        return 0
    per_row = 4 * k_pad + 8 * d
    tn = budget // per_row
    if tn < 8:
        return 0
    return int(min(1024, tn // 8 * 8))


# Minimum data-tile height the k-chunked path accepts: chunks sized for a
# taller tile amortize the per-chunk re-read of x better, and 256 keeps
# the sublane dimension comfortably aligned.
_ASSIGN_CHUNK_MIN_ROWS = 256


def _assign_k_chunk(d: int) -> int:
    """Largest 128-aligned centroid-chunk size whose resident block still
    admits a >= ``_ASSIGN_CHUNK_MIN_ROWS``-row data tile.

    Closed form of ``_assign_resident_cap(kc, d) >= MIN_ROWS``: the
    budget ``15 MB - kc·(4d+4)`` must cover ``MIN_ROWS·(4·kc + 8d)``.
    """
    budget = 15 * 1024 * 1024 - _ASSIGN_CHUNK_MIN_ROWS * 8 * d
    kc = budget // (4 * d + 4 + 4 * _ASSIGN_CHUNK_MIN_ROWS)
    return max(kc // 128 * 128, 0)


def assign_block_cap(k: int, d: int) -> int:
    """Data-tile height :func:`assign_fused` will use, 0 if it cannot run.

    Large k no longer returns 0: once the whole codebook stops fitting
    VMEM next to a usable data tile, :func:`assign_fused` chunks the
    centroid axis at the XLA level (``ceil(k/k_chunk)`` identical resident
    kernels — one compiled program — merged on unclamped scores with
    strict ``<``, so earlier chunks win exact ties and the global argmin
    keeps the lowest index). Only a dimension too deep for even one
    128-centroid chunk returns 0 (d ≳ 28k at the 15 MB budget).
    """
    cap = _assign_resident_cap(k, d)
    if cap > 0:
        return cap
    kc = _assign_k_chunk(d)
    if kc < 128:
        return 0
    return _assign_resident_cap(kc, d)


def assign_fused(
    data, centroids, block_rows: int = 1024, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused distance+argmin assignment (squared-L2, lowest-index ties).

    Drop-in for :func:`vq_tpu.ops.kmeans.assign` on TPU. ``interpret=True``
    runs the Pallas interpreter (CPU testing). bf16 data stays half-width
    in HBM and upcasts per-tile in VMEM (f16 upcasts here — Mosaic has no
    IEEE-f16 path; the XLA fallback keeps f16 resident).

    Codebooks past the resident VMEM budget (~10k centroids at d=128)
    dispatch the k-chunked form: the centroid axis is split into
    equal-size chunks (padded so every chunk reuses ONE compiled kernel),
    each chunk's per-row (min, argmin) is computed with clamping off, and
    chunks merge with strict ``<`` so the lowest global index wins exact
    ties — bit-identical codes to the XLA argmin over the full score row.
    Data is re-read once per chunk (the codebook is read once total),
    which is the bandwidth-minimal orientation when n >> k.
    """
    data = jnp.asarray(data)
    if data.dtype != jnp.bfloat16:
        data = data.astype(jnp.float32)
    centroids = jnp.asarray(centroids, jnp.float32)
    if data.shape[0] == 0:  # block_rows would hit 0 -> div-by-zero pads
        return (
            jnp.zeros((0,), jnp.int32),
            jnp.zeros((0,), jnp.float32),
        )
    k, d = centroids.shape[0], data.shape[1]
    cap = _assign_resident_cap(k, d)
    if cap > 0:
        block_rows = min(block_rows, _round_up(data.shape[0], 8), cap)
        return _assign_fused_jit(
            data, centroids, int(block_rows), bool(interpret)
        )
    kc = _assign_k_chunk(d)
    if kc < 128:
        raise ValueError(
            f"assign_fused: k={k}, d={d} exceeds the kernel's VMEM budget "
            "even k-chunked — gate with assign_block_cap(...) > 0 and use "
            "the XLA assign"
        )
    cap = _assign_resident_cap(kc, d)
    block_rows = min(block_rows, _round_up(data.shape[0], 8), cap)
    return _assign_fused_chunked_jit(
        data, centroids, int(kc), int(block_rows), bool(interpret)
    )


@functools.partial(
    jax.jit, static_argnames=("k_chunk", "block_rows", "interpret")
)
def _assign_fused_chunked_jit(
    data, centroids, k_chunk: int, block_rows: int, interpret: bool
):
    """k-chunked fused assign: ceil(k/k_chunk) identical resident kernels
    (one compiled program), merged on UNCLAMPED ``min + ||x||^2`` scores —
    strict ``<`` keeps the earlier (lower-index) chunk on exact ties, so
    the merged argmin is bit-identical to a single argmin over the full
    score row. The final distance clamps to 0 once, after the merge.
    """
    k = centroids.shape[0]
    nchunks = _cdiv(k, k_chunk)
    # Full chunks share one kernel shape (one remote compile); only a
    # partial final chunk adds a second shape (its own jit call pads and
    # +inf-masks the tail like any small-k call).
    run_codes = None
    run_dist = None
    for ci in range(nchunks):
        lo = ci * k_chunk
        hi = min(lo + k_chunk, k)
        chunk = jax.lax.slice_in_dim(centroids, lo, hi, axis=0)
        codes_c, dist_c = _assign_fused_jit(
            data, chunk, block_rows, interpret, clamp=False
        )
        codes_c = codes_c + lo
        if run_codes is None:
            run_codes, run_dist = codes_c, dist_c
        else:
            better = dist_c < run_dist  # strict: earlier chunk wins ties
            run_codes = jnp.where(better, codes_c, run_codes)
            run_dist = jnp.where(better, dist_c, run_dist)
    return run_codes, jnp.maximum(run_dist, 0.0)


# ---------------------------------------------------------------------------
# Fused PQ encode: x [n, m*s] x codebooks [m, k, s] -> codes [n, m] i32
# ---------------------------------------------------------------------------


def _pq_encode_kernel(
    x_ref, cb_ref, cc_ref, out_ref, *, m, s, k, precision, argmin_mode
):
    """One [TN, m*s] tile against all m codebooks (resident in VMEM).

    The m subspace matmuls are a static unroll — each is [TN, s] x [s, k]
    on the MXU followed by an argmin on the VPU, all without leaving VMEM.
    ``argmin_mode`` selects the VPU argmin strategy (see :func:`_int_argmin`).
    """
    tn = x_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1)
    for i in range(m):
        # Half-width (f16/bf16) corpora upcast per-tile here in VMEM; the
        # HBM-resident array stays half (the Vector<f16> analog).
        xs = x_ref[:, pl.ds(i * s, s)].astype(jnp.float32)  # [TN, s]
        cbi = cb_ref[i]  # [k, s]
        xc = jax.lax.dot_general(
            xs, cbi, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [TN, k]
        scores = cc_ref[i][None, :] - 2.0 * xc
        _, idx = _int_argmin(scores, col, argmin_mode)
        out_ref[:, i] = idx


def _pq_encode_bf16_kernel(x_ref, cb_ref, cc_ref, out_ref, *, m, s, k):
    """Fast-mode variant: operands arrive in VMEM already bf16, so each
    subspace matmul is a single MXU pass with no in-kernel conversion (the
    conversion cost is what made casting f32 operands inside the kernel
    slower than HIGHEST). ``cc`` stays f32, computed from the f32 codebooks.
    """
    for i in range(m):
        xs = x_ref[:, pl.ds(i * s, s)]  # [TN, s] bf16
        xc = jax.lax.dot_general(
            xs, cb_ref[i], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, k] f32 accumulation
        scores = cc_ref[i][None, :] - 2.0 * xc
        out_ref[:, i] = jnp.argmin(scores, axis=-1).astype(jnp.int32)


def _pq_encode_bf16x3_kernel(x_ref, cbh_ref, cbl_ref, cc_ref, out_ref, *, m, s, k):
    """bf16x3 variant: each f32 operand splits into bf16 hi + lo halves and
    the product is reconstructed from three bf16 MXU passes
    (hi*hi + hi*lo + lo*hi) — half the passes of a full-f32 (HIGHEST)
    matmul at ~2^-22 relative accuracy, which keeps argmins identical except
    at exact near-ties. The codebook halves are precomputed on the host side
    of the call; the data tile splits on the VPU in-kernel.
    """
    _dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for i in range(m):
        xs = x_ref[:, pl.ds(i * s, s)]  # [TN, s] f32
        xh = xs.astype(jnp.bfloat16)
        xl = (xs - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        cbh = cbh_ref[i]  # [k, s] bf16 high halves
        cbl = cbl_ref[i]  # [k, s] bf16 residuals
        xc = _dot(xh, cbh) + _dot(xh, cbl) + _dot(xl, cbh)
        scores = cc_ref[i][None, :] - 2.0 * xc
        out_ref[:, i] = jnp.argmin(scores, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("block_rows", "interpret", "precision", "argmin_mode"),
)
def _pq_encode_fused_jit(
    x, cb, block_rows: int, interpret: bool, precision, argmin_mode: str
):
    n, dim = x.shape
    m, k, s = cb.shape
    k_pad = _round_up(k, 128)
    cbp = jnp.pad(cb, ((0, 0), (0, k_pad - k), (0, 0)))
    cc = jnp.sum(cbp * cbp, axis=-1)  # [m, k_pad]
    cc = jnp.where(jnp.arange(k_pad)[None, :] < k, cc, jnp.inf)

    n_pad = _round_up(n, block_rows)
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))

    grid = (n_pad // block_rows,)
    x_spec = pl.BlockSpec((block_rows, dim), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    cc_spec = pl.BlockSpec((m, k_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block_rows, m), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_pad, m), jnp.int32)

    if precision == "bf16_fast":
        xb = xp.astype(jnp.bfloat16)
        cbb = cbp.astype(jnp.bfloat16)
        cb_spec = pl.BlockSpec((m, k_pad, s), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        codes = pl.pallas_call(
            functools.partial(_pq_encode_bf16_kernel, m=m, s=s, k=k_pad),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                cb_spec,
                cc_spec,
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(xb, cbb, cc)
        return codes[:n]

    if precision == "bf16x3":
        xp = xp.astype(jnp.float32)  # hi/lo split in-kernel needs f32
        cbh = cbp.astype(jnp.bfloat16)
        cbl = (cbp - cbh.astype(jnp.float32)).astype(jnp.bfloat16)
        cb_spec = pl.BlockSpec((m, k_pad, s), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        codes = pl.pallas_call(
            functools.partial(_pq_encode_bf16x3_kernel, m=m, s=s, k=k_pad),
            grid=grid,
            in_specs=[x_spec, cb_spec, cb_spec, cc_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(xp, cbh, cbl, cc)
        return codes[:n]

    codes = pl.pallas_call(
        functools.partial(
            _pq_encode_kernel, m=m, s=s, k=k_pad, precision=precision,
            argmin_mode=argmin_mode,
        ),
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((m, k_pad, s), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            cc_spec,
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(xp, cbp, cc)
    return codes[:n]


def pq_encode_fused(
    x, codebooks, block_rows: int = 1024, interpret: bool = False,
    precision=_PRECISION, argmin_mode: str = "int2",
) -> jnp.ndarray:
    """Fused PQ encode: all m subspaces' distance+argmin in one kernel pass.

    Codebooks stay resident in VMEM across data tiles (m*k*s*4 bytes — 128 KB
    for the 8x256x16 north-star config, 1.5 MB for 16x256x96), so HBM traffic
    is exactly one read of ``x`` and one write of the codes.

    ``precision`` controls the MXU matmul: HIGHEST (default) is bit-compatible
    with the XLA/CPU f32 paths; lower settings trade near-tie argmin fidelity
    for pass count. ``argmin_mode`` selects the VPU argmin lowering (see
    :func:`_int_argmin`). The default ``"int2"`` is measured ~12% faster
    than the variadic reduce at the 1M x 128 8x256 bench config AND is the
    only mode bit-exact vs XLA's lowest-index tie contract on TPU —
    Mosaic's native argmin was caught breaking exact ties to a non-lowest
    index (7 / 8M codes at 1M scale). ``"int1"`` packs the index into the
    key's low bits (single reduce, fastest) and may flip codes at
    near-ties (~1.4e-4 observed). ``block_rows``
    is capped at 2048 — larger tiles overflow the ~16 MB VMEM budget (scores
    + codebooks + unrolled temporaries).
    """
    x = jnp.asarray(x)
    # bf16 is the TPU-native half format and stays half in HBM; Mosaic has
    # no IEEE-f16 path (verified: remote compile fails), so f16 upcasts at
    # this boundary (the XLA fallback keeps f16 resident instead).
    if x.dtype != jnp.bfloat16:
        x = x.astype(jnp.float32)
    cb = jnp.asarray(codebooks, jnp.float32)
    if x.shape[0] == 0:  # block_rows would hit 0 -> div-by-zero pads
        return jnp.zeros((0, cb.shape[0]), jnp.int32)
    block_rows = min(block_rows, _round_up(x.shape[0], 8), 2048)
    return _pq_encode_fused_jit(
        x, cb, int(block_rows), bool(interpret), precision, str(argmin_mode)
    )


# ---------------------------------------------------------------------------
# Fused PQ Lloyd accumulate: one pass over [n, m*s] data against all m
# codebooks -> per-subspace (sums [m, k, s], counts [m, k], inertia []).
# ---------------------------------------------------------------------------


def _pq_lloyd_acc_kernel(
    x_ref, cb_ref, cc_ref, valid_ref,
    sums_ref, counts_ref, inertia_ref,
    *, m, s, k,
):
    """The PQ-training hot loop fused: for every subspace, assignment
    (distance matmul + argmin) and (sum, count) accumulation happen in VMEM
    while the data tile is resident — one HBM read of x per Lloyd iteration
    for all m sub-problems. The single-codebook kernel is the m == 1 case.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)
        inertia_ref[:] = jnp.zeros_like(inertia_ref)

    tn = x_ref.shape[0]
    # The mask arrives as this block's [TN, 1] column via BlockSpec — an
    # in-kernel pl.ds(step*tn, tn) lane slice would need 128-aligned offsets
    # (Mosaic), which breaks for n < 1024 not a multiple of 128.
    valid = valid_ref[:, 0]  # [TN] 0/1 row mask
    ones_row = jnp.ones((1, tn), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1)
    for i in range(m):
        xs = x_ref[:, pl.ds(i * s, s)]  # [TN, s]
        cbi = cb_ref[i]  # [k, s]
        xc = jax.lax.dot_general(
            xs, cbi, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION,
        )
        scores = cc_ref[i][None, :] - 2.0 * xc  # [TN, k]
        # int2 integer-key argmin: faster than the variadic reduce and the
        # only Mosaic lowering exact on lowest-index ties (see _int_argmin).
        smin, idx = _int_argmin(scores, col, "int2")
        onehot = (idx[:, None] == col).astype(jnp.float32) * valid[:, None]
        sums_ref[i] += jax.lax.dot_general(
            onehot, xs, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION,
        )  # [k, s]
        counts_ref[i, :] += jax.lax.dot_general(
            ones_row, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION,
        )[0]
        xx = jnp.sum(xs * xs, axis=-1)
        contrib = (jnp.maximum(smin + xx, 0.0) * valid)[:, None]
        inertia_ref[:, :] += jax.lax.dot_general(
            ones_row, contrib, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION,
        )


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _pq_lloyd_accumulate_jit(x, cb, block_rows: int, interpret: bool):
    n, dim = x.shape
    m, k, s = cb.shape
    k_pad = _round_up(k, 128)
    cbp = jnp.pad(cb, ((0, 0), (0, k_pad - k), (0, 0)))
    cc = jnp.sum(cbp * cbp, axis=-1)
    cc = jnp.where(jnp.arange(k_pad)[None, :] < k, cc, jnp.inf)

    n_pad = _round_up(n, block_rows)
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    valid = (jnp.arange(n_pad) < n).astype(jnp.float32)[:, None]  # [n_pad, 1]

    sums, counts, inertia = pl.pallas_call(
        functools.partial(_pq_lloyd_acc_kernel, m=m, s=s, k=k_pad),
        grid=(n_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k_pad, s), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m, k_pad, s), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k_pad, s), jnp.float32),
            jax.ShapeDtypeStruct((m, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xp, cbp, cc, valid)
    return sums[:, :k], counts[:, :k], inertia[0, 0]


def pq_fused_block_cap(m: int, k: int, s: int) -> int:
    """Largest safe data-tile height for the fused PQ-Lloyd accumulate.

    Resident VMEM: double-buffered ``[TN, m·s]`` x block, codebooks +
    sums (``2·m·k_pad·s·4`` B), and ~4 live ``[TN, k_pad]`` f32
    temporaries (scores/one-hot/argmin keys). The round-3 default
    (TN=1024 unconditionally) compile-crashed the remote Mosaic helper
    at the north-star d=1536 m=16 shape (~19 MB live); this budget
    clamps the tile instead (416 rows there, unchanged 1024 at the
    d=128 bench shape). Returns 0 when no tile fits — callers fall back
    to the XLA accumulate.
    """
    k_pad = _round_up(max(int(k), 128), 128)
    d = int(m) * int(s)
    fixed = 2 * m * k_pad * s * 4 + 2 * m * k_pad * 4
    budget = 10 * 1024 * 1024 - fixed
    if budget <= 0:
        return 0
    per_row = (2 * d + 4 * k_pad) * 4
    tn = budget // per_row
    if tn < 64:
        return 0
    return int(min(1024, tn // 8 * 8))


def pq_lloyd_accumulate_fused(
    x, codebooks, block_rows: int = 1024, interpret: bool = False
):
    """One fused PQ-Lloyd pass over ``x [n, m*s]``: per-subspace
    ``(sums [m, k, s], counts [m, k])`` and total inertia, accumulated in
    VMEM across the data sweep (one HBM read of x for all m sub-problems).

    ``block_rows`` is clamped by :func:`pq_fused_block_cap`; shapes the
    budget rejects outright raise (callers gate on the cap and keep the
    XLA accumulate — a Mosaic VMEM failure is a remote compiler crash,
    not a catchable fallback)."""
    x = jnp.asarray(x, jnp.float32)
    cb = jnp.asarray(codebooks, jnp.float32)
    m, k, sdim = cb.shape
    if x.shape[0] == 0:
        return (
            jnp.zeros((m, k, sdim), jnp.float32),
            jnp.zeros((m, k), jnp.float32),
            jnp.float32(0.0),
        )
    cap = pq_fused_block_cap(m, k, sdim)
    if cap <= 0:
        raise ValueError(
            f"pq_lloyd_accumulate_fused: (m={m}, k={k}, s={sdim}) "
            "exceeds the kernel's VMEM budget — gate with "
            "pq_fused_block_cap(...) > 0 and use the XLA accumulate"
        )
    block_rows = min(block_rows, _round_up(x.shape[0], 8), cap)
    return _pq_lloyd_accumulate_jit(x, cb, int(block_rows), bool(interpret))


# ---------------------------------------------------------------------------
# Fused ADC lookup: tables [Q, m, k] x codes [n, m] -> distances [Q, n]
# ---------------------------------------------------------------------------


def _adc_lookup_kernel(tables_ref, codes_ref, out_ref, *, m, k):
    """One corpus tile of codes against all queries' lookup tables.

    Per subspace: a one-hot of the tile's codes is built in VMEM and hits
    the MXU against the [Q, k] table slice (contraction k — fully filled).
    The XLA scan version materializes the [n, k] one-hot in HBM (1 GB at
    n=1M, k=256); here it never leaves VMEM.
    """
    tn = codes_ref.shape[0]
    q = tables_ref.shape[0]
    acc = jnp.zeros((q, tn), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1)
    for i in range(m):
        onehot = (codes_ref[:, i][:, None] == col).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            tables_ref[:, i, :], onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION,
        )  # [Q, TN]
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("block_cols", "interpret"))
def _adc_lookup_fused_jit(tables, codes, block_cols: int, interpret: bool):
    q, m, k = tables.shape
    n = codes.shape[0]
    q_pad = _round_up(q, 8)
    tab = jnp.pad(tables, ((0, q_pad - q), (0, 0), (0, 0)))
    n_pad = _round_up(n, block_cols)
    # Padded rows get code 0 — harmless, their columns are sliced off.
    cp = jnp.pad(codes, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_adc_lookup_kernel, m=m, k=k),
        grid=(n_pad // block_cols,),
        in_specs=[
            pl.BlockSpec((q_pad, m, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_cols, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_pad, block_cols), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(tab, cp)
    return out[:q, :n]


def adc_lookup_fused(
    tables, codes, block_cols: int = 2048, interpret: bool = False
) -> jnp.ndarray:
    """Fused asymmetric-distance lookup: sum of per-subspace table entries.

    ``tables``: ``[Q, m, k]`` f32 (per-query per-subspace distances to every
    centroid); ``codes``: ``[n, m]`` integer code words. Returns ``[Q, n]``.
    Keep ``Q`` modest (<= ~512) so the tables fit VMEM; tile larger query
    batches outside.
    """
    tables = jnp.asarray(tables, jnp.float32)
    codes = jnp.asarray(codes).astype(jnp.int32)
    block_cols = min(block_cols, _round_up(codes.shape[0], 8))
    return _adc_lookup_fused_jit(tables, codes, int(block_cols), bool(interpret))


# ---------------------------------------------------------------------------
# Fused ADC scan + per-tile top-k: tables [Q, m, k] x codes [m, n]
#   -> per-tile top-`fetch` (values, global ids)
# ---------------------------------------------------------------------------


_ADC_TOPK_LANES = 128  # per-tile candidate block width (one lane tile)
_INF_KEY = 0x7F800000  # _orderable_key(+inf), as a Python literal


def _adc_scan_topk_kernel(
    tab_hbm, codes_ref, *refs,
    m, k, fetch, n, block, mode, pack_bits,
):
    """One corpus tile: VMEM-resident distances + in-tile top-``fetch``.

    The distances never leave VMEM: per 128-lane slice, each subspace's
    contribution is a VPU lane-gather of the query's table row
    (``take_along_axis`` → ``tpu.dynamic_gather``; k ≤ 256 splits into
    two 128-lane halves + select — no one-hot, so no 256×-wasted MXU
    passes, which bound both the XLA scan and the round-1 one-hot
    kernel), then ``fetch`` iterations of the ``int2`` orderable-key min
    extract the tile's best candidates in ascending (distance, id)
    order. HBM traffic drops from the scan's ``[Q, n]`` accumulator
    round-trips to ``codes`` (m bytes/vec) + ``[Q, ntiles·128]``
    candidate blocks. Measured at Q=128, n=1M, 8×256 with searches
    scan-chained inside one dispatch (the only honest timing through
    this tunnel — per-dispatch RPC is ~29 ms): 10.6 ms/batch device vs
    24.0 for the XLA chunked scan — 2.27×, 12.1k QPS/chip. Committed
    record: docs/performance.md "Flat ADC scan" section; the kernel
    variants and dead ends live in benchmarks/adc_vmem_bench.py.

    Summation order per element matches the XLA scan (subspace 0..m-1,
    f32), so distances are bit-identical and ties resolve to the lowest
    global id in both paths (verified exact at 1M rows on hardware).

    ``mode`` selects the per-element distance assembly (each mirrors the
    corresponding XLA scan's elementwise op order exactly):

    * ``"sum"`` — d = Σ table entries (PQ ADC; sqrt outside).
    * ``"l2"``  — d = max(qn² − 2·Σ + off, 0): additive-code (RQ)
      squared-L2 with stored row norms as ``off``; qn² rides as an extra
      broadcast table slot.
    * ``"dot"`` — d = −Σ (smaller-is-better negated scores).
    """
    if mode == "l2":
        off_ref, vals_ref, ids_ref, tab_ref, tab_sem = refs
    else:
        vals_ref, ids_ref, tab_ref, tab_sem = refs
    kh = k // 128  # 1 or 2 lane-tile halves
    q = tab_ref.shape[2]
    tn = codes_ref.shape[1]
    t = pl.program_id(0)

    # Tables live in HBM and are DMA'd into persistent VMEM scratch ONCE
    # (a constant-index VMEM BlockSpec re-DMAs every grid step), in the
    # gather-friendly [m, kh, q, 128] layout so each subspace-half is a
    # contiguous [q, 128] tile — slicing a [q, m, k] scratch instead
    # forces a sublane relayout per use per step, which measured as the
    # whole kernel cost on this chip.
    @pl.when(t == 0)
    def _load_tables():
        dma = pltpu.make_async_copy(tab_hbm, tab_ref, tab_sem)
        dma.start()
        dma.wait()

    per = 8 // pack_bits  # codes per stored byte (1 for plain u8)
    parts = []
    for s in range(0, tn, 128):
        acc = jnp.zeros((q, 128), jnp.float32)
        for i in range(m):
            if pack_bits == 8:
                c = codes_ref[i, s:s + 128].astype(jnp.int32)  # [128]
            else:
                # Sub-byte corpus stays packed in HBM; unpack on the VPU
                # (little-endian nibbles, vq_tpu/ops/packing.py layout).
                byte = codes_ref[i // per, s:s + 128].astype(jnp.int32)
                c = jnp.bitwise_and(
                    jnp.right_shift(byte, (i % per) * pack_bits),
                    (1 << pack_bits) - 1,
                )
            idx = jnp.broadcast_to(c[None, :], (q, 128))
            m7 = jnp.bitwise_and(idx, 127)
            if kh == 1:
                g = jnp.take_along_axis(tab_ref[i, 0], m7, axis=1)
            else:
                g = jnp.where(
                    idx < 128,
                    jnp.take_along_axis(tab_ref[i, 0], m7, axis=1),
                    jnp.take_along_axis(tab_ref[i, 1], m7, axis=1),
                )
            acc = acc + g
        if mode == "l2":
            qn2 = tab_ref[m, 0]  # [q, 128], lanes identical
            off = off_ref[s // 128][None, :]  # [1, 128]
            acc = jnp.maximum(qn2 - 2.0 * acc + off, 0.0)
        elif mode == "dot":
            acc = -acc
        parts.append(acc)
    acc = jnp.concatenate(parts, axis=1)  # [q, tn]

    col = jax.lax.broadcasted_iota(jnp.int32, (q, tn), 1)
    gid0 = t * block
    valid = (gid0 + col) < n
    inf_key = jnp.int32(_INF_KEY)
    key0 = jnp.where(valid, _orderable_key(acc), inf_key)

    lane = jax.lax.broadcasted_iota(jnp.int32, (q, _ADC_TOPK_LANES), 1)
    vals0 = jnp.full((q, _ADC_TOPK_LANES), jnp.inf, jnp.float32)
    ids0 = jnp.full((q, _ADC_TOPK_LANES), -1, jnp.int32)

    def extract(j, state):
        key, vals, ids = state
        mkey = jnp.min(key, axis=-1, keepdims=True)  # [q, 1]
        idx = jnp.min(
            jnp.where(key == mkey, col, jnp.int32(0x7FFFFFFF)),
            axis=-1, keepdims=True,
        )  # [q, 1] lowest index among minima (exact ties)
        hit = mkey < inf_key
        vals = jnp.where((lane == j) & hit, _key_to_f32(mkey), vals)
        ids = jnp.where((lane == j) & hit, gid0 + idx, ids)
        key = jnp.where(col == idx, inf_key, key)
        return key, vals, ids

    _, vals, ids = jax.lax.fori_loop(
        0, fetch, extract, (key0, vals0, ids0)
    )
    vals_ref[:, :] = vals
    ids_ref[:, :] = ids


@functools.partial(
    jax.jit,
    static_argnames=(
        "fetch", "block_cols", "mode", "pack_bits", "interpret"
    ),
)
def _adc_scan_topk_jit(
    tables, codes_t, qn2, offsets,
    fetch: int, block_cols: int, mode: str, pack_bits: int,
    interpret: bool,
):
    q, m, k = tables.shape
    n = codes_t.shape[1]
    q_pad = _round_up(q, 8)
    k_pad = 128 if k <= 128 else 256
    kh = k_pad // 128
    # Gather-friendly layout: [m, kh, q, 128] — each (subspace, half)
    # slice is one contiguous [q, 128] VMEM tile (see kernel docstring).
    tab = (
        jnp.pad(tables, ((0, q_pad - q), (0, 0), (0, k_pad - k)))
        .reshape(q_pad, m, kh, 128)
        .transpose(1, 2, 0, 3)
    )
    n_pad = _round_up(n, block_cols)
    cp = jnp.pad(codes_t, ((0, 0), (0, n_pad - n)))
    ntiles = n_pad // block_cols
    P = _ADC_TOPK_LANES
    m_slots = m
    rows = codes_t.shape[0]  # m, or ceil(m*pack_bits/8) when packed
    operands = [tab, cp]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # tables stay in HBM
        pl.BlockSpec((rows, block_cols), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    if mode == "l2":
        # qn² rides as an extra broadcast table slot; per-row offsets
        # (stored norms) pack [n/128, 128] so their block's last-two
        # dims satisfy Mosaic's divisibility rule.
        m_slots = m + 1
        qrow = jnp.broadcast_to(
            jnp.pad(qn2, (0, q_pad - q))[None, None, :, None],
            (1, kh, q_pad, 128),
        )
        operands[0] = jnp.concatenate([tab, qrow], axis=0)
        off = jnp.pad(offsets, (0, n_pad - n)).reshape(-1, 128)
        sb = block_cols // 128
        operands.append(off)
        in_specs.append(
            pl.BlockSpec((sb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    vals, ids = pl.pallas_call(
        functools.partial(
            _adc_scan_topk_kernel,
            m=m, k=k_pad, fetch=fetch, n=n, block=block_cols, mode=mode,
            pack_bits=pack_bits,
        ),
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((q_pad, P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, ntiles * P), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, ntiles * P), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m_slots, kh, q_pad, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*operands)
    return vals[:q], ids[:q]


# Proven live-VMEM ceiling of the gather+top-k kernel: the round-3 hardware
# config (Q=128, m=8, k=256, block 8192) = 14 B x 128 x 8192 of tile state
# (distances + orderable keys + iotas) + the persistent [m_slots, kh, q, 128]
# f32 table scratch. Both terms must be budgeted: the scratch grows with m
# and Q and, unbudgeted, pushes admissible-looking configs (e.g. m=16, k=256,
# Q~512) past Mosaic's ~16 MB scoped-VMEM limit — a compile failure at
# runtime rather than a fallback (round-3 advisor finding).
_ADC_TOPK_TILE_BYTES = 14
_ADC_TOPK_BUDGET = (
    8192 * 128 * _ADC_TOPK_TILE_BYTES + 8 * 2 * 128 * 128 * 4
)


def adc_topk_max_block(q: int, m: int, k: int, mode: str = "sum") -> int:
    """Widest corpus tile ``adc_scan_topk_fused``'s VMEM budget admits.

    Returns 0 when the config cannot run at all (Q > 1024, or the
    persistent table scratch alone exhausts the proven ceiling) — callers
    must then keep their XLA chunked scan, because the alternative is a
    Mosaic VMEM compile failure that cannot be caught as a fallback.
    ``mode`` matters: ``"l2"`` adds one broadcast table slot (qn²) and
    quantizes the tile to 1024 lanes (the per-row offsets block's Mosaic
    sublane rule).
    """
    q_pad = _round_up(max(int(q), 1), 8)
    if q_pad > 1024:
        return 0
    kh = 2 if int(k) > 128 else 1
    m_slots = int(m) + (1 if mode == "l2" else 0)
    scratch = m_slots * kh * q_pad * 128 * 4
    cols = (_ADC_TOPK_BUDGET - scratch) // (_ADC_TOPK_TILE_BYTES * q_pad)
    quantum = 1024 if mode == "l2" else 128
    return max(cols // quantum * quantum, 0)


def adc_scan_topk_fused(
    tables,
    codes_t,
    fetch: int,
    block_cols: int = 8192,
    *,
    mode: str = "sum",
    qn2=None,
    offsets=None,
    pack_bits: int = 8,
    interpret: bool = False,
):
    """Per-tile top-``fetch`` ADC candidates without materializing [Q, n].

    ``tables``: ``[Q, m, k]`` f32 (k ≤ 256); ``codes_t``: ``[m, n]``
    integer codes TRANSPOSED so each subspace's codes are lane-contiguous
    (u8 stays u8 into VMEM). Returns ``(vals [Q, T*128], ids [Q, T*128])``
    where tile ``t``'s candidates occupy lanes ``[t*128, t*128+fetch)`` in
    ascending (value, id) order, ``inf``/``-1``-padded; the caller merges
    with one stable ``top_k`` (lowest global id wins exact ties, matching
    the XLA chunked scan). ``fetch`` ≤ 128.

    ``mode`` (see the kernel docstring): ``"sum"`` (PQ), ``"l2"``
    (additive codes with per-row stored norms — pass ``qn2 [Q]`` and
    ``offsets [n]``), or ``"dot"`` (negated score sums).

    ``pack_bits`` < 8: ``codes_t`` is the sub-byte-packed
    ``[ceil(m*bits/8), n]`` layout (``vq_tpu.ops.packing``, transposed);
    bytes unpack on the VPU inside the kernel — the corpus never exists
    unpacked.
    """
    if not 1 <= int(fetch) <= _ADC_TOPK_LANES:
        raise ValueError(f"fetch must be in [1, {_ADC_TOPK_LANES}]")
    if mode not in ("sum", "l2", "dot"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "l2" and (qn2 is None or offsets is None):
        raise ValueError("mode='l2' requires qn2 and offsets")
    if int(pack_bits) not in (1, 2, 4, 8):
        raise ValueError("pack_bits must be 1, 2, 4, or 8")
    tables = jnp.asarray(tables, jnp.float32)
    if tables.shape[2] > 256:
        raise ValueError("adc_scan_topk_fused requires k <= 256")
    codes_t = jnp.asarray(codes_t)
    if pack_bits < 8:
        want = -(-tables.shape[1] * int(pack_bits) // 8)
        if codes_t.shape[0] != want:
            raise ValueError(
                f"packed codes_t must have {want} rows, got "
                f"{codes_t.shape[0]}"
            )
        codes_t = codes_t.astype(jnp.uint8)
    elif codes_t.dtype != jnp.uint8:
        codes_t = codes_t.astype(jnp.int32)
    # Live VMEM = persistent table scratch + ~14 B per [q_pad, block]
    # tile element; budgeted together against the proven round-3 ceiling
    # (see adc_topk_max_block). Wider query batches / more subspaces
    # shrink the tile; configs whose scratch alone blows the budget are
    # rejected so callers gate on adc_topk_max_block and keep the XLA
    # chunked scan.
    q_pad = _round_up(tables.shape[0], 8)
    if q_pad > 1024:
        raise ValueError(
            "adc_scan_topk_fused supports Q <= 1024 per call (VMEM); "
            "chunk the query batch"
        )
    vmem_cols = adc_topk_max_block(
        tables.shape[0], tables.shape[1], tables.shape[2], mode
    )
    if vmem_cols <= 0:
        raise ValueError(
            "adc_scan_topk_fused: persistent table scratch for this "
            f"(Q={tables.shape[0]}, m={tables.shape[1]}, "
            f"k={tables.shape[2]}, mode={mode!r}) exceeds the kernel's "
            "VMEM budget — gate with adc_topk_max_block(...) > 0 and "
            "use the XLA chunked scan"
        )
    block_cols = min(block_cols, vmem_cols)
    block_cols = _round_up(
        min(block_cols, _round_up(codes_t.shape[1], 128)), 128
    )
    if mode == "l2":
        # The offsets block's sublane dim (block/128) must satisfy the
        # Mosaic 8-divisibility rule.
        block_cols = _round_up(block_cols, 1024)
        qn2 = jnp.asarray(qn2, jnp.float32)
        offsets = jnp.asarray(offsets, jnp.float32)
    else:
        qn2 = jnp.zeros((0,), jnp.float32)
        offsets = jnp.zeros((0,), jnp.float32)
    return _adc_scan_topk_jit(
        tables, codes_t, qn2, offsets,
        int(fetch), int(block_cols), mode, int(pack_bits),
        bool(interpret),
    )


# ---------------------------------------------------------------------------
# Fused IVF probe ADC: per-(query, probe) tables [QP, m, k] x probed lists'
# codes (selected by scalar-prefetched list ids) -> distances [QP, cap]
# ---------------------------------------------------------------------------


_IVF_PAIRS_PER_STEP = 8  # output sublane alignment (Mosaic: 8-row blocks)
# Lane-dim tile ceiling of the list axis. The matvec path clamps it by a
# VMEM budget (deep rows shrink the tile); measured at 1M x 128 cap 2048
# the kernel runs 3.25 / 3.02 / 2.98 ms per 128-query batch at tile
# 512 / 1024 / 2048 (issue-bound, ~8% from fewer grid steps).
_IVF_CAP_TILE = 2048


def _ivf_probe_kernel(probe_ref, tab_ref, *refs, m, kk, cap_tile, cap):
    """8 (query, probe-slot) pairs x one cap tile per grid step.

    The scalar-prefetched ``probe_ref`` drives 8 codes BlockSpecs (one per
    pair slot), so each probed list's ``[cap_tile, m]`` codes are DMA'd
    straight into VMEM — the XLA formulation instead materializes a
    ``[Q, nprobe, cap, m]`` gather plus per-subspace ``take_along_axis``
    lane gathers in HBM, which is what made IVF search 20x slower than a
    flat scan in round 1 (docs/performance.md). The table lookup is m
    one-hot row-matvecs ``[1, kk] x [kk, cap_tile]`` accumulated in VMEM;
    the second grid axis walks cap tiles, and this one-hot path clamps
    the tile to 512 so the ``[kk, cap_tile]`` intermediate stays small
    (bucket capacities can reach tens of thousands under skew — one-shot
    ``[kk, cap]`` would blow VMEM and Mosaic compile time). Only kk >
    256 configs reach this kernel; kk ≤ 256 dispatches the gather
    variant below.

    Codes load at their stored width (u8 when k <= 256, upcast in VMEM),
    so the DMA reads a quarter of the bytes the old i32 path did. Lanes
    past the true ``cap`` are masked to 0 by position (a stored-width array
    can't hold an out-of-range sentinel when k == 256).
    """
    del probe_ref  # consumed by the BlockSpec index maps
    codes_refs, out_ref = refs[:_IVF_PAIRS_PER_STEP], refs[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (kk, cap_tile), 0)
    pos = pl.program_id(1) * cap_tile + jax.lax.broadcasted_iota(
        jnp.int32, (1, cap_tile), 1
    )
    lane_valid = pos < cap  # [1, cap_tile]
    for j in range(_IVF_PAIRS_PER_STEP):
        acc = jnp.zeros((1, cap_tile), jnp.float32)
        for i in range(m):
            codes_i = codes_refs[j][0, :, i].astype(jnp.int32)  # [cap_tile]
            onehot = (row == codes_i[None, :]).astype(jnp.float32)
            acc += jax.lax.dot_general(
                tab_ref[j, i][None, :], onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PRECISION,
            )  # [1, cap_tile]
        out_ref[j, :] = jnp.where(lane_valid, acc, 0.0)[0]


def _ivf_probe_gather_kernel(probe_ref, tab_ref, *refs, m, kh, cap_tile, cap):
    """Gather variant of :func:`_ivf_probe_kernel` for kk ≤ 256.

    The one-hot row-matvec fills 1 of the MXU's 128 rows per pair; here
    each subspace's table entry comes from a VPU lane-gather instead,
    with all 8 pairs stacked on sublanes (``idx [8, 128]`` rows from the
    8 probed lists' codes, source ``tab[i, half] [8, 128]`` rows from
    the 8 pairs' tables) — full vreg utilization, no MXU pass, same
    exact f32 table entries summed in the same subspace order as the
    one-hot path (bit-identical distances).
    """
    del probe_ref  # consumed by the BlockSpec index maps
    P = _IVF_PAIRS_PER_STEP
    codes_refs, out_ref = refs[:P], refs[-1]
    pos0 = pl.program_id(1) * cap_tile
    parts = []
    for s in range(0, cap_tile, 128):
        acc = jnp.zeros((P, 128), jnp.float32)
        for i in range(m):
            idx = jnp.concatenate(
                [
                    codes_refs[j][0, i, s:s + 128][None, :].astype(
                        jnp.int32
                    )
                    for j in range(P)
                ],
                axis=0,
            )  # [P, 128]
            m7 = jnp.bitwise_and(idx, 127)
            if kh == 1:
                g = jnp.take_along_axis(tab_ref[i, 0], m7, axis=1)
            else:
                g = jnp.where(
                    idx < 128,
                    jnp.take_along_axis(tab_ref[i, 0], m7, axis=1),
                    jnp.take_along_axis(tab_ref[i, 1], m7, axis=1),
                )
            acc = acc + g
        lane_pos = pos0 + s + jax.lax.broadcasted_iota(
            jnp.int32, (P, 128), 1
        )
        parts.append(jnp.where(lane_pos < cap, acc, 0.0))
    out_ref[:, :] = jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ivf_probe_adc_jit(tables, probe, bucket_codes, interpret: bool):
    qp, m, kk = tables.shape
    nlist, cap, _ = bucket_codes.shape
    kk_pad = _round_up(kk, 128)
    # The gather path's per-step VMEM is tiny (codes at m bytes/vec); the
    # one-hot fallback materializes [kk_pad, cap_tile] f32 per matvec, so
    # it keeps the original 512 tile.
    tile_cap = _IVF_CAP_TILE if kk_pad <= 256 else 512
    cap_tile = min(tile_cap, _round_up(cap, 128))
    cap_pad = _round_up(cap, cap_tile)
    P = _IVF_PAIRS_PER_STEP
    qp_pad = _round_up(qp, P)
    probe_flat = jnp.pad(
        probe.reshape(-1).astype(jnp.int32), (0, qp_pad - qp)
    )  # padded pairs probe list 0; their rows are sliced off below
    # u8 codes stay u8 all the way into VMEM (1/4 the probe DMA bytes);
    # anything else (or kk > 256) runs as i32. Cap padding is zeros — the
    # kernel masks out-of-cap lanes by position.
    if bucket_codes.dtype != jnp.uint8 or kk > 256:
        bucket_codes = bucket_codes.astype(jnp.int32)

    if kk_pad <= 256:
        # Gather path: tables in the gather-friendly [m, kh, QP, 128]
        # layout; codes transposed so each subspace is lane-contiguous.
        kh = kk_pad // 128
        tab = (
            jnp.pad(tables, ((0, qp_pad - qp), (0, 0), (0, kk_pad - kk)))
            .reshape(qp_pad, m, kh, 128)
            .transpose(1, 2, 0, 3)
        )
        codes_t = jnp.pad(
            bucket_codes, ((0, 0), (0, cap_pad - cap), (0, 0))
        ).transpose(0, 2, 1)  # [nlist, m, cap_pad]

        def gcodes_spec(j):
            return pl.BlockSpec(
                (1, m, cap_tile),
                lambda i, c, pr, j=j: (pr[i * P + j], 0, c),
                memory_space=pltpu.VMEM,
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(qp_pad // P, cap_pad // cap_tile),
            in_specs=[
                pl.BlockSpec((m, kh, P, 128),
                             lambda i, c, pr: (0, 0, i, 0),
                             memory_space=pltpu.VMEM),
                *[gcodes_spec(j) for j in range(P)],
            ],
            out_specs=pl.BlockSpec((P, cap_tile),
                                   lambda i, c, pr: (i, c),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            functools.partial(
                _ivf_probe_gather_kernel,
                m=m, kh=kh, cap_tile=cap_tile, cap=cap,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((qp_pad, cap_pad), jnp.float32),
            interpret=interpret,
        )(probe_flat, tab, *([codes_t] * P))
        return out[:qp, :cap]

    tab = jnp.pad(
        tables, ((0, qp_pad - qp), (0, 0), (0, kk_pad - kk))
    )
    codes = jnp.pad(
        bucket_codes, ((0, 0), (0, cap_pad - cap), (0, 0))
    )

    def codes_spec(j):
        return pl.BlockSpec(
            (1, cap_tile, m), lambda i, c, pr, j=j: (pr[i * P + j], c, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qp_pad // P, cap_pad // cap_tile),
        in_specs=[
            pl.BlockSpec((P, m, kk_pad), lambda i, c, pr: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *[codes_spec(j) for j in range(P)],
        ],
        out_specs=pl.BlockSpec((P, cap_tile), lambda i, c, pr: (i, c),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _ivf_probe_kernel, m=m, kk=kk_pad, cap_tile=cap_tile, cap=cap
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((qp_pad, cap_pad), jnp.float32),
        interpret=interpret,
    )(probe_flat, tab, *([codes] * P))
    return out[:qp, :cap]


def ivf_probe_adc_fused(
    tables, probe, bucket_codes, interpret: bool = False
) -> jnp.ndarray:
    """ADC distances for probed IVF lists without the big HBM gather.

    ``tables``: ``[QP, m, kk]`` f32 per-(query, probe-slot) lookup tables;
    ``probe``: ``[QP]`` int list ids; ``bucket_codes``: ``[nlist, cap, m]``
    integer codes. Returns ``[QP, cap]`` distances (padded slots accumulate
    0 — mask with bucket ids outside).
    """
    tables = jnp.asarray(tables, jnp.float32)
    probe = jnp.asarray(probe)
    return _ivf_probe_adc_jit(tables, probe, bucket_codes, bool(interpret))


# ---------------------------------------------------------------------------
# Fused IVF probe matvec: per-(query, probe) vectors [QP, d] x probed lists'
# payload rows (selected by scalar-prefetched list ids) -> dots [QP, cap]
# ---------------------------------------------------------------------------


def _ivf_matvec_kernel(probe_ref, q_ref, *refs, cap_tile, cap):
    """8 (query, probe-slot) pairs x one cap tile per grid step.

    The generalization of :func:`_ivf_probe_kernel` from table lookups to
    raw dot products: each probed list's ``[cap_tile, d]`` payload rows
    are DMA'd straight into VMEM at STORED width (f32 / bf16 / f16 rows
    for IVF-Flat, u8 codes for IVF-SQ — half / quarter the bytes) and one
    ``[1, d] x [d, cap_tile]`` MXU matvec per pair computes
    ``lhs · row`` for every row of the tile. The XLA formulation instead
    gathers ``[Q, nprobe, cap, d]`` through HBM (write + re-read) before
    its einsum — the same mega-gather that made round-1 IVF-PQ 20x slower
    than a flat scan. Distance assembly (norm terms, affine offsets,
    id masking, top-k) stays outside where it's cheap ``[Q, cap]`` work.
    """
    del probe_ref  # consumed by the BlockSpec index maps
    payload_refs, out_ref = refs[:_IVF_PAIRS_PER_STEP], refs[-1]
    pos = pl.program_id(1) * cap_tile + jax.lax.broadcasted_iota(
        jnp.int32, (1, cap_tile), 1
    )
    lane_valid = pos < cap  # [1, cap_tile]
    for j in range(_IVF_PAIRS_PER_STEP):
        rows = payload_refs[j][0]  # [cap_tile, d] at stored width
        if jnp.issubdtype(rows.dtype, jnp.integer):
            # Mosaic has no direct u8 -> f32 cast; hop through i32.
            rows = rows.astype(jnp.int32)
        rows = rows.astype(jnp.float32)
        dot = jax.lax.dot_general(
            q_ref[j][None, :], rows,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION,
        )  # [1, cap_tile]
        out_ref[j, :] = jnp.where(lane_valid, dot, 0.0)[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ivf_probe_matvec_jit(qvecs, probe, payload, interpret: bool):
    qp, d = qvecs.shape
    nlist, cap, _ = payload.shape
    d_pad = _round_up(d, 128)
    itemsize = jnp.dtype(payload.dtype).itemsize
    # VMEM budget: 8 payload tiles of [cap_tile, d_pad] at stored width,
    # capped at ~4 MB so deep rows (d=1536) still fit alongside the f32
    # upcast the matvec makes per pair.
    budget = 4 * 1024 * 1024
    cap_tile = max(
        128,
        min(
            _IVF_CAP_TILE,
            (budget // (_IVF_PAIRS_PER_STEP * d_pad * itemsize)) // 128 * 128,
        ),
    )
    cap_tile = min(cap_tile, _round_up(cap, 128))
    cap_pad = _round_up(cap, cap_tile)
    P = _IVF_PAIRS_PER_STEP
    qp_pad = _round_up(qp, P)
    q = jnp.pad(
        qvecs.astype(jnp.float32), ((0, qp_pad - qp), (0, d_pad - d))
    )
    probe_flat = jnp.pad(
        probe.reshape(-1).astype(jnp.int32), (0, qp_pad - qp)
    )
    payload = jnp.pad(
        payload, ((0, 0), (0, cap_pad - cap), (0, d_pad - d))
    )

    def payload_spec(j):
        return pl.BlockSpec(
            (1, cap_tile, d_pad), lambda i, c, pr, j=j: (pr[i * P + j], c, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qp_pad // P, cap_pad // cap_tile),
        in_specs=[
            pl.BlockSpec((P, d_pad), lambda i, c, pr: (i, 0),
                         memory_space=pltpu.VMEM),
            *[payload_spec(j) for j in range(P)],
        ],
        out_specs=pl.BlockSpec((P, cap_tile), lambda i, c, pr: (i, c),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _ivf_matvec_kernel, cap_tile=cap_tile, cap=cap
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((qp_pad, cap_pad), jnp.float32),
        interpret=interpret,
    )(probe_flat, q, *([payload] * P))
    return out[:qp, :cap]


def ivf_probe_matvec_fused(
    qvecs, probe, payload, interpret: bool = False
) -> jnp.ndarray:
    """Dot products between per-(query, probe-slot) vectors and every row
    of the probed lists, without the big HBM gather.

    ``qvecs``: ``[QP, d]`` f32 left vectors (already residual-shifted /
    step-scaled as the caller's decomposition needs); ``probe``: ``[QP]``
    int list ids; ``payload``: ``[nlist, cap, d]`` rows at stored width
    (f32/bf16/f16 raw rows, or u8 SQ codes — upcast in VMEM). Returns
    ``[QP, cap]`` f32 dots (padded lanes 0 — mask with bucket ids
    outside).
    """
    qvecs = jnp.asarray(qvecs, jnp.float32)
    probe = jnp.asarray(probe)
    return _ivf_probe_matvec_jit(qvecs, probe, payload, bool(interpret))


# ---------------------------------------------------------------------------
# Fused Lloyd iteration accumulate:
#   data [n, d] x centroids [k, d] -> sums [k, d], counts [k], inertia []
# ---------------------------------------------------------------------------


def _lloyd_acc_kernel(
    x_ref, c_ref, cc_ref, valid_ref,
    sums_ref, counts_ref, inertia_ref,
    *, k_tile, k_total,
):
    """Assignment + (sum, count) accumulation fused in VMEM.

    Grid walks data tiles sequentially; the [k, d] sums / [k] counts output
    blocks map to the same block for every program, so they live in VMEM for
    the whole pass and are written back to HBM once at the end — the
    accumulate-then-reduce structure the multi-host psum path feeds on.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)
        inertia_ref[:] = jnp.zeros_like(inertia_ref)

    x = x_ref[:]  # [TN, d]
    tn = x.shape[0]
    # Per-block [TN, 1] mask column via BlockSpec (see _pq_lloyd_acc_kernel).
    valid = valid_ref[:, 0]  # [TN] f32 0/1 row mask

    run_min = jnp.full((tn,), jnp.inf, jnp.float32)
    run_idx = jnp.zeros((tn,), jnp.int32)
    num_k_tiles = k_total // k_tile
    tile_col = jax.lax.broadcasted_iota(jnp.int32, (tn, k_tile), 1)
    for t in range(num_k_tiles):
        c = c_ref[pl.ds(t * k_tile, k_tile), :]
        cc = cc_ref[0, pl.ds(t * k_tile, k_tile)]
        xc = jax.lax.dot_general(
            x, c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION,
        )
        # int2 integer-key argmin (see _int_argmin): faster + tie-exact.
        tile_min, tile_idx = _int_argmin(
            cc[None, :] - 2.0 * xc, tile_col, "int2"
        )
        better = tile_min < run_min
        run_idx = jnp.where(better, tile_idx + t * k_tile, run_idx)
        run_min = jnp.where(better, tile_min, run_min)

    onehot = (
        (run_idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (tn, k_total), 1))
        .astype(jnp.float32)
        * valid[:, None]
    )  # [TN, k]
    sums_ref[:] += jax.lax.dot_general(
        onehot, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PRECISION,
    )  # [k, d]
    # Cross-row reductions to [1, k] / [1, 1] are expressed as matmuls with a
    # ones vector: Mosaic rejects 1-D->scalar vector reductions ("Offset
    # change" not implemented) and scalar VMEM stores, and the MXU does these
    # for free alongside the sums matmul anyway.
    ones_row = jnp.ones((1, tn), jnp.float32)
    counts_ref[:, :] += jax.lax.dot_general(
        ones_row, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PRECISION,
    )  # [1, k]
    xx = jnp.sum(x * x, axis=-1)
    contrib = (jnp.maximum(run_min + xx, 0.0) * valid)[:, None]  # [TN, 1]
    inertia_ref[:, :] += jax.lax.dot_general(
        ones_row, contrib, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PRECISION,
    )  # [1, 1]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _lloyd_accumulate_jit(data, centroids, block_rows: int, interpret: bool):
    n, d = data.shape
    k = centroids.shape[0]
    k_tile = min(_round_up(k, 128), 512)
    k_pad = _round_up(k, k_tile)
    c = jnp.pad(centroids, ((0, k_pad - k), (0, 0)))
    cc = jnp.sum(c * c, axis=-1)
    cc = jnp.where(jnp.arange(k_pad) < k, cc, jnp.inf)[None, :]

    n_pad = _round_up(n, block_rows)
    x = jnp.pad(data, ((0, n_pad - n), (0, 0)))
    valid = (jnp.arange(n_pad) < n).astype(jnp.float32)[:, None]  # [n_pad, 1]

    grid = (n_pad // block_rows,)
    sums, counts, inertia = pl.pallas_call(
        functools.partial(_lloyd_acc_kernel, k_tile=k_tile, k_total=k_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k_pad, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, c, cc, valid)
    return sums[:k], counts[0, :k], inertia[0, 0]


def lloyd_accumulate_fused(
    data, centroids, block_rows: int = 1024, interpret: bool = False
):
    """One fused Lloyd pass: per-cluster (sums [k,d], counts [k], inertia []).

    The Pallas analog of ``vq_tpu.ops.kmeans._assign_accumulate``:
    accumulators persist in VMEM across the whole data sweep and hit HBM
    exactly once.
    """
    data = jnp.asarray(data, jnp.float32)
    centroids = jnp.asarray(centroids, jnp.float32)
    if data.shape[0] == 0:
        k, d = centroids.shape
        return (
            jnp.zeros((k, d), jnp.float32),
            jnp.zeros((k,), jnp.float32),
            jnp.float32(0.0),
        )
    block_rows = min(block_rows, _round_up(data.shape[0], 8))
    return _lloyd_accumulate_jit(
        data, centroids, int(block_rows), bool(interpret)
    )

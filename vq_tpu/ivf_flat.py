"""IVF-Flat, IVF-SQ, and IVF-RQ: inverted-file indexes over raw /
scalar-quantized / additive-residual-quantized rows.

Together with :class:`~vq_tpu.ivf.IVFPQIndex` these complete the standard
IVF coding ladder (the faiss ``IndexIVFFlat`` / ``IndexIVFScalarQuantizer``
/ ``IndexIVFPQ`` / ``IndexIVFResidualQuantizer`` family — the reference
library has no index layer at all):

* **IVF-Flat** — buckets hold the raw rows (f32, or bf16/f16 for half the
  HBM); probed distances are exact. The accuracy ceiling, at d·4 (or d·2)
  bytes/vector.
* **IVF-SQ** — buckets hold per-dimension SQ8 codes of the residual
  ``x − coarse_centroid(x)`` (or of ``x`` itself with
  ``by_residual=False``) plus one exact decoded norm per entry; probed
  distances are exact distances to the *decoded* rows via the same affine
  decomposition the flat :class:`~vq_tpu.search.SQIndex` scan uses
  (``qr·ŷ = qr·lo + (qr*step)·c`` — one MXU matmul per probed rank).
  d bytes/vector: 4× smaller than IVF-Flat, ~d/m× larger but markedly more
  accurate than IVF-PQ.
* **IVF-RQ** — buckets hold additive RQ codes of the residual (S bytes at
  k ≤ 256) plus two stored cross-terms (``||ŷ||²`` and ``c_list·ŷ``) that
  make the search tables probe-independent (see
  :func:`_ivf_rq_search_jit`); probed distances are exact distances to
  the decoded rows. Same code bytes as IVF-PQ at m = S, better
  reconstruction on data without coordinate-aligned structure.

TPU-first structure, shared with IVF-PQ: storage is a chunked
inverted-list pool (:mod:`vq_tpu.ivf_pool` — fixed ``CH``-row chunks +
per-list chains; appends scatter in place, no padded ``[nlist, cap, …]``
tensor or flat shadow copy ever materializes, which is what lifts the
single-chip build past the round-4 4-8M-row ceiling). The coarse scan is
one ``[Q, nlist]`` MXU matmul, then a ``lax.scan`` over probe ranks so
the working set per step is one ``[Q, cap, d]`` virtual-bucket gather —
no ``[Q, nprobe, cap, d]`` mega-gather. Probed candidates merge through
a running top-k exactly like the chunked flat scans. Storage is
device-resident end-to-end: a 32M-row corpus never round-trips to the
host, only per-list counts do.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.errors import (
    DimensionMismatch,
    EmptyInput,
    InvalidData,
    InvalidParameter,
)
from vq_tpu.ivf_pool import ChunkPool, take_list_ids, take_list_payload
from vq_tpu.models.sq import PerDimScalarQuantizer
from vq_tpu.ops.kmeans import assign, lloyd
from vq_tpu.ops.pick import pick_rows
from vq_tpu.utils.serialize import _from_npz, _to_npz

__all__ = ["IVFFlatIndex", "IVFSQIndex", "IVFRQIndex"]

_STORE_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def _coarse_probe(q: jnp.ndarray, coarse: jnp.ndarray, nprobe: int, metric: str):
    """Top-``nprobe`` lists per query: min ||q−c||² for L2, max q·c for dot.

    Returns ``(probe [Q, nprobe] int32, qc [Q, nlist] f32)`` — ``qc`` is
    reused by dot-metric scoring offsets.
    """
    cc = jnp.sum(coarse * coarse, axis=-1)
    qc = jax.lax.dot_general(
        q, coarse, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    scores = -qc if metric == "dot" else cc[None, :] - 2.0 * qc
    _, probe = jax.lax.top_k(-scores, nprobe)
    return probe, qc


def _merge_probe_topk(body, Q: int, nprobe: int, fetch: int, probe_axis_xs):
    """Running top-``fetch`` merge over probe ranks (smaller-is-better)."""

    def step(carry, xs):
        best_d, best_i = carry
        d, ids = body(xs)  # [Q, cap] scores (inf-masked), [Q, cap] ids
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        neg, pos = jax.lax.top_k(-cat_d, fetch)
        return (-neg, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (
        jnp.full((Q, fetch), jnp.inf, jnp.float32),
        jnp.full((Q, fetch), -1, jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(step, init, probe_axis_xs)
    return best_i, best_d


def _range_merge(body, Q: int, nprobe: int, fetch: int, radius, probe_T):
    """Probe-rank scan keeping the best ``fetch`` hits within ``radius``
    (smaller-is-better domain) plus TRUE per-query hit counts."""

    def step(carry, p_col):
        best_d, best_i, counts = carry
        d, ids = body(p_col, p_col)  # [Q, cap], pads already inf/-masked
        hit = (d <= radius) & (ids >= 0)
        counts = counts + jnp.sum(hit, axis=1, dtype=jnp.int32)
        cat_d = jnp.concatenate(
            [best_d, jnp.where(hit, d, jnp.inf)], axis=1
        )
        cat_i = jnp.concatenate(
            [best_i, jnp.where(hit, ids, -1)], axis=1
        )
        neg, pos = jax.lax.top_k(-cat_d, fetch)
        return (
            -neg,
            jnp.take_along_axis(cat_i, pos, axis=1),
            counts,
        ), None

    init = (
        jnp.full((Q, fetch), jnp.inf, jnp.float32),
        jnp.full((Q, fetch), -1, jnp.int32),
        jnp.zeros((Q,), jnp.int32),
    )
    (best_d, best_i, counts), _ = jax.lax.scan(step, init, probe_T)
    return best_i, best_d, counts


def _flat_topk(d: jnp.ndarray, ids: jnp.ndarray, k: int):
    """Top-k over the flattened [Q, nprobe, cap] probe pool
    (smaller-is-better; pads already inf-masked)."""
    Q = d.shape[0]
    neg, pos = jax.lax.top_k(-d.reshape(Q, -1), k)
    return jnp.take_along_axis(ids.reshape(Q, -1), pos, axis=1), -neg


# ---------------------------------------------------------------------------
# Per-probe-rank scan bodies, shared by the single-device lax.scan search
# and the list-sharded multi-device search (vq_tpu/parallel/ivf_scan.py).
# Each maker closes over the query-side precomputations and the chunk-pool
# arrays and returns ``body(pg, pl) -> (d [Q, cap_eff] inf-masked, ids)``:
# ``pg`` are GLOBAL list ids (index replicated arrays: coarse, qc, cc),
# ``pl`` index the chains — identical to ``pg`` on one device,
# shard-local (pre-clamped) under shard_map. A probed "bucket" is the
# virtual gather of the list's chunk chain (ivf_pool.take_list_*); ids
# are −1 wherever a slot is dead, which downstream masking already
# handles exactly as it handled −1 pads in the old dense layout.
# ---------------------------------------------------------------------------


def _flat_scan_body(
    q, qn2, metric, pool_rows, pool_sqn, slot_ids, chains_s, cap
):
    def body(pg, pl):
        del pg
        rows = take_list_payload(pool_rows, chains_s, pl).astype(jnp.float32)
        ids = take_list_ids(slot_ids, chains_s, pl, cap)  # [Q, ce]
        sqn = take_list_payload(pool_sqn, chains_s, pl)  # [Q, ce]
        qy = jnp.einsum(
            "qd,qcd->qc", q, rows,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if metric == "dot":
            d = -qy
        else:
            d = jnp.maximum(qn2[:, None] - 2.0 * qy + sqn, 0.0)
        return jnp.where(ids >= 0, d, jnp.inf), ids

    return body


def _sq_scan_body(
    q, qc, coarse, lo, step, metric, by_residual,
    pool_codes, pool_sqn, slot_ids, chains_s, cap,
):
    def body(pg, pl):
        codes = take_list_payload(pool_codes, chains_s, pl).astype(
            jnp.float32
        )
        ids = take_list_ids(slot_ids, chains_s, pl, cap)  # [Q, ce]
        sqn = take_list_payload(pool_sqn, chains_s, pl)  # [Q, ce]
        if metric == "dot":
            qs = q * step[None, :]
            qy = (q @ lo)[:, None] + jnp.einsum(
                "qd,qcd->qc", qs, codes,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if by_residual:
                qy = qy + jnp.take_along_axis(
                    qc, pg[:, None], axis=1
                )  # + q·c_probe
            d = -qy
        else:
            qr = (
                q - jnp.take(coarse, pg, axis=0) if by_residual else q
            )  # [Q, d]
            qry = (qr @ lo)[:, None] + jnp.einsum(
                "qd,qcd->qc", qr * step[None, :], codes,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            qrn2 = jnp.sum(qr * qr, axis=-1)
            d = jnp.maximum(qrn2[:, None] - 2.0 * qry + sqn, 0.0)
        return jnp.where(ids >= 0, d, jnp.inf), ids

    return body


def _rq_scan_body(
    q, qn2, qc, cc, tables, metric, by_residual,
    pool_codes, pool_sqn, pool_cross, slot_ids, chains_s, cap,
):
    S = pool_codes.shape[-1]

    def body(pg, pl):
        codes = take_list_payload(pool_codes, chains_s, pl).astype(jnp.int32)
        ids = take_list_ids(slot_ids, chains_s, pl, cap)  # [Q, ce]
        sqn = take_list_payload(pool_sqn, chains_s, pl)  # [Q, ce]
        cross = take_list_payload(pool_cross, chains_s, pl)  # [Q, ce]
        tsum = jnp.zeros(codes.shape[:2], jnp.float32)
        for s in range(S):
            tsum = tsum + jnp.take_along_axis(
                tables[:, s, :], codes[:, :, s], axis=1
            )
        qc_sel = jnp.take_along_axis(qc, pg[:, None], axis=1)  # [Q, 1]
        if metric == "dot":
            qy = tsum + (qc_sel if by_residual else 0.0)
            d = -qy
        else:
            if by_residual:
                qrn2 = qn2[:, None] - 2.0 * qc_sel + jnp.take(
                    cc, pg
                )[:, None]
            else:
                qrn2 = qn2[:, None]
            d = jnp.maximum(qrn2 - 2.0 * (tsum - cross) + sqn, 0.0)
        return jnp.where(ids >= 0, d, jnp.inf), ids

    return body


# The fused probe kernels scalar-prefetch one CHUNK id per (query,
# probe, chain position); that operand lives in SMEM (~1 MB on this
# part) and Mosaic refuses past it ("prefetched SMEM operand" compile
# error — seen at the graph build's 8192-query candidate sweep). Past
# the budget the searches fall back to their XLA scans.
_PROBE_PREFETCH_BUDGET_BYTES = 786_432


def _prefetch_fits(Q: int, nprobe: int, chains_s) -> bool:
    return Q * nprobe * chains_s.shape[1] * 4 <= _PROBE_PREFETCH_BUDGET_BYTES


def _probe_chains(chains_s, probe):
    """Chain entries of the probed lists, flattened for the fused
    kernels: the pool is addressed as an ``[n_chunks, CH, …]`` bucket
    array probed with CHUNK ids — one kernel pair slot per (query,
    probe, chain position). Dead entries clamp to chunk 0; their lanes
    are masked outside via :func:`take_list_ids`."""
    ct = jnp.take(chains_s, probe, axis=0)  # [Q, np, maxc_s]
    return jnp.maximum(ct, 0).reshape(-1), ct.shape[-1]


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "k", "cap", "metric", "use_pallas", "interpret"),
)
def _ivf_flat_search_jit(
    q: jnp.ndarray,  # [Q, d] f32
    coarse: jnp.ndarray,  # [nlist, d]
    pool_rows: jnp.ndarray,  # [n_chunks, CH, d] f32/bf16/f16
    pool_sqn: jnp.ndarray,  # [n_chunks, CH] f32 ||stored row||²
    slot_ids: jnp.ndarray,  # [n_chunks, CH] int32, -1 empty
    chains_s: jnp.ndarray,  # [nlist, maxc_s] int32 chunk chains, -1 pad
    nprobe: int,
    k: int,
    cap: int,
    metric: str,
    use_pallas: bool = False,
    interpret: bool = False,
):
    Q, d_ = q.shape
    ch = slot_ids.shape[1]
    probe, _ = _coarse_probe(q, coarse, nprobe, metric)
    qn2 = jnp.sum(q * q, axis=-1)  # [Q]

    if use_pallas and _prefetch_fits(Q, nprobe, chains_s):
        # Fused probe: scalar-prefetched CHUNK ids DMA each probed
        # chain's chunks straight into VMEM at stored width — no
        # [Q, np, cap, d] HBM gather. The kernel is the padded-bucket
        # one unchanged: a chunk is natively one of its "lists".
        from vq_tpu.ops.pallas_kernels import ivf_probe_matvec_fused

        chunks, maxc_s = _probe_chains(chains_s, probe)
        qvecs = jnp.broadcast_to(
            q[:, None, None, :], (Q, nprobe, maxc_s, d_)
        ).reshape(-1, d_)
        qy = ivf_probe_matvec_fused(
            qvecs, chunks, pool_rows, interpret=interpret
        ).reshape(Q, nprobe, maxc_s * ch)
        ids = take_list_ids(slot_ids, chains_s, probe, cap)  # [Q, np, ce]
        if metric == "dot":
            d = -qy
        else:
            sqn = take_list_payload(pool_sqn, chains_s, probe)
            d = jnp.maximum(qn2[:, None, None] - 2.0 * qy + sqn, 0.0)
        return _flat_topk(jnp.where(ids >= 0, d, jnp.inf), ids, k)

    body = _flat_scan_body(
        q, qn2, metric, pool_rows, pool_sqn, slot_ids, chains_s, cap
    )
    return _merge_probe_topk(
        lambda p: body(p, p), Q, nprobe, k, probe.T
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "nprobe", "k", "cap", "metric", "by_residual", "use_pallas",
        "interpret",
    ),
)
def _ivf_sq_search_jit(
    q: jnp.ndarray,  # [Q, d] f32
    coarse: jnp.ndarray,  # [nlist, d]
    lo: jnp.ndarray,  # [d]
    step: jnp.ndarray,  # [d]
    pool_codes: jnp.ndarray,  # [n_chunks, CH, d] u8
    pool_sqn: jnp.ndarray,  # [n_chunks, CH] f32 ||decoded residual ŷ||²
    slot_ids: jnp.ndarray,  # [n_chunks, CH] int32, -1 empty
    chains_s: jnp.ndarray,  # [nlist, maxc_s] int32 chunk chains
    nprobe: int,
    k: int,
    cap: int,
    metric: str,
    by_residual: bool,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Probe + asymmetric SQ scan.

    A stored entry decodes to ``y = [c_probe +] ŷ`` with ``ŷ = lo + step·c``.
    With ``qr = q − c_probe`` (or ``q`` when non-residual):

    * L2: ``||q − y||² = ||qr||² − 2·qr·ŷ + ||ŷ||²`` and
      ``qr·ŷ = qr·lo + (qr*step)·c`` — one MXU matmul per probe rank.
    * dot: ``q·y = [q·c_probe] + q·lo + (q*step)·c``.

    Exact decoded-row distances either way (``||ŷ||²`` is stored exact).
    """
    Q, d_ = q.shape
    ch = slot_ids.shape[1]
    probe, qc = _coarse_probe(q, coarse, nprobe, metric)

    if use_pallas and _prefetch_fits(Q, nprobe, chains_s):
        # Fused probe over u8 codes (quarter the DMA bytes of f32 rows);
        # the affine offsets (qr·lo, norms) assemble outside on [Q, ce]
        # shapes. The left vectors carry the residual shift per
        # (query, probe) pair, so one kernel serves both codings.
        from vq_tpu.ops.pallas_kernels import ivf_probe_matvec_fused

        chunks, maxc_s = _probe_chains(chains_s, probe)
        ids = take_list_ids(slot_ids, chains_s, probe, cap)  # [Q, np, ce]
        sqn = take_list_payload(pool_sqn, chains_s, probe)
        if metric == "dot":
            lhs = jnp.broadcast_to(
                (q * step[None, :])[:, None, None, :],
                (Q, nprobe, maxc_s, d_),
            )
            partial = ivf_probe_matvec_fused(
                lhs.reshape(-1, d_), chunks, pool_codes,
                interpret=interpret,
            ).reshape(Q, nprobe, maxc_s * ch)
            qy = (q @ lo)[:, None, None] + partial
            if by_residual:
                qy = qy + jnp.take_along_axis(qc, probe, axis=1)[..., None]
            d = -qy
        else:
            qr = (
                q[:, None, :] - jnp.take(coarse, probe, axis=0)
                if by_residual
                else jnp.broadcast_to(q[:, None, :], (Q, nprobe, d_))
            )  # [Q, np, d]
            lhs = jnp.broadcast_to(
                (qr * step[None, None, :])[:, :, None, :],
                (Q, nprobe, maxc_s, d_),
            )
            partial = ivf_probe_matvec_fused(
                lhs.reshape(-1, d_), chunks, pool_codes,
                interpret=interpret,
            ).reshape(Q, nprobe, maxc_s * ch)
            qry = (qr @ lo)[..., None] + partial
            qrn2 = jnp.sum(qr * qr, axis=-1)  # [Q, np]
            d = jnp.maximum(qrn2[..., None] - 2.0 * qry + sqn, 0.0)
        return _flat_topk(jnp.where(ids >= 0, d, jnp.inf), ids, k)

    body = _sq_scan_body(
        q, qc, coarse, lo, step, metric, by_residual,
        pool_codes, pool_sqn, slot_ids, chains_s, cap,
    )
    return _merge_probe_topk(
        lambda p: body(p, p), Q, nprobe, k, probe.T
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "nprobe", "k", "cap", "metric", "by_residual", "use_pallas",
        "interpret",
    ),
)
def _ivf_rq_search_jit(
    q: jnp.ndarray,  # [Q, d] f32
    coarse: jnp.ndarray,  # [nlist, d]
    codebooks: jnp.ndarray,  # [S, k, d] RQ stage codebooks
    pool_codes: jnp.ndarray,  # [n_chunks, CH, S] u8
    pool_sqn: jnp.ndarray,  # [n_chunks, CH] f32 ||decoded residual ŷ||²
    pool_cross: jnp.ndarray,  # [n_chunks, CH] f32 c_list·ŷ (0 non-residual)
    slot_ids: jnp.ndarray,  # [n_chunks, CH] int32, -1 empty
    chains_s: jnp.ndarray,  # [nlist, maxc_s] int32 chunk chains
    nprobe: int,
    k: int,
    cap: int,
    metric: str,
    by_residual: bool,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Probe + additive-code ADC scan.

    A stored entry decodes to ``y = [c_list +] ŷ`` with
    ``ŷ = Σ_s C_s[code_s]``. The trick that keeps tables probe-independent:
    ``q_r·ŷ = (q − c_list)·ŷ = Σ_s T[q, s, code_s] − c_list·ŷ`` where
    ``T[q,s,j] = q·C_s[j]`` uses the RAW query, and ``c_list·ŷ`` is a
    per-row constant precomputed at ``add`` time (stored alongside
    ``||ŷ||²``, exactly like faiss's stored-norm additive indexes). So:

    * L2: ``||q−y||² = ||q_r||² − 2(Tsum − cross) + ||ŷ||²`` with
      ``||q_r||²`` analytic from the coarse scan.
    * dot: ``q·y = [q·c_list] + Tsum``.

    Exact decoded-row distances either way; the per-probe work is S
    ``[Q, cap]`` table gathers — no per-(query, list) table rebuild.
    """
    Q = q.shape[0]
    S = codebooks.shape[0]
    ch = slot_ids.shape[1]
    probe, qc = _coarse_probe(q, coarse, nprobe, metric)
    tables = jnp.einsum(
        "qd,skd->qsk", q, codebooks,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Q, S, k]
    qn2 = jnp.sum(q * q, axis=-1)  # [Q]
    cc = jnp.sum(coarse * coarse, axis=-1)  # [nlist]

    if use_pallas and _prefetch_fits(Q, nprobe, chains_s):
        # The tables are probe-INDEPENDENT (raw-query dots; the stored
        # c_list·ŷ cross-terms carry the residual shift), so the fused
        # ADC probe kernel applies directly — tables just replicate per
        # (probe, chain-position) slot.
        from vq_tpu.ops.pallas_kernels import ivf_probe_adc_fused

        kk = tables.shape[-1]
        chunks, maxc_s = _probe_chains(chains_s, probe)
        tab_rep = jnp.broadcast_to(
            tables[:, None, None], (Q, nprobe, maxc_s, S, kk)
        ).reshape(Q * nprobe * maxc_s, S, kk)
        tsum = ivf_probe_adc_fused(
            tab_rep, chunks, pool_codes, interpret=interpret
        ).reshape(Q, nprobe, maxc_s * ch)  # [Q, np, ce]
        ids = take_list_ids(slot_ids, chains_s, probe, cap)
        sqn = take_list_payload(pool_sqn, chains_s, probe)
        cross = take_list_payload(pool_cross, chains_s, probe)
        qc_sel = jnp.take_along_axis(qc, probe, axis=1)  # [Q, np]
        if metric == "dot":
            qy = tsum + (qc_sel[..., None] if by_residual else 0.0)
            d = -qy
        else:
            if by_residual:
                qrn2 = (
                    qn2[:, None] - 2.0 * qc_sel + jnp.take(cc, probe)
                )[..., None]
            else:
                qrn2 = qn2[:, None, None]
            d = jnp.maximum(qrn2 - 2.0 * (tsum - cross) + sqn, 0.0)
        return _flat_topk(jnp.where(ids >= 0, d, jnp.inf), ids, k)

    body = _rq_scan_body(
        q, qn2, qc, cc, tables, metric, by_residual,
        pool_codes, pool_sqn, pool_cross, slot_ids, chains_s, cap,
    )
    return _merge_probe_topk(
        lambda p: body(p, p), Q, nprobe, k, probe.T
    )


@functools.partial(
    jax.jit, static_argnames=("nprobe", "fetch", "cap", "metric")
)
def _ivf_flat_range_jit(
    q, coarse, pool_rows, pool_sqn, slot_ids, chains_s,
    nprobe: int, fetch: int, cap: int, radius, metric: str,
):
    Q = q.shape[0]
    probe, _ = _coarse_probe(q, coarse, nprobe, metric)
    qn2 = jnp.sum(q * q, axis=-1)
    body = _flat_scan_body(
        q, qn2, metric, pool_rows, pool_sqn, slot_ids, chains_s, cap
    )
    return _range_merge(body, Q, nprobe, fetch, radius, probe.T)


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "fetch", "cap", "metric", "by_residual"),
)
def _ivf_sq_range_jit(
    q, coarse, lo, step, pool_codes, pool_sqn, slot_ids, chains_s,
    nprobe: int, fetch: int, cap: int, radius, metric: str,
    by_residual: bool,
):
    Q = q.shape[0]
    probe, qc = _coarse_probe(q, coarse, nprobe, metric)
    body = _sq_scan_body(
        q, qc, coarse, lo, step, metric, by_residual,
        pool_codes, pool_sqn, slot_ids, chains_s, cap,
    )
    return _range_merge(body, Q, nprobe, fetch, radius, probe.T)


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "fetch", "cap", "metric", "by_residual"),
)
def _ivf_rq_range_jit(
    q, coarse, codebooks, pool_codes, pool_sqn, pool_cross,
    slot_ids, chains_s, nprobe: int, fetch: int, cap: int, radius,
    metric: str, by_residual: bool,
):
    Q = q.shape[0]
    probe, qc = _coarse_probe(q, coarse, nprobe, metric)
    tables = jnp.einsum(
        "qd,skd->qsk", q, codebooks,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    qn2 = jnp.sum(q * q, axis=-1)
    cc = jnp.sum(coarse * coarse, axis=-1)
    body = _rq_scan_body(
        q, qn2, qc, cc, tables, metric, by_residual,
        pool_codes, pool_sqn, pool_cross, slot_ids, chains_s, cap,
    )
    return _range_merge(body, Q, nprobe, fetch, radius, probe.T)


@functools.partial(jax.jit, static_argnames=("nlist", "cap"))
def _pack_buckets_jit(lists: jnp.ndarray, payloads: tuple, nlist: int, cap: int):
    """Scatter flat per-row payload arrays into padded dense buckets.

    Fully device-resident (one stable sort + one scatter per payload) —
    a 1M×128 IVF-Flat corpus never round-trips to the host, which matters
    through a ~MB/s PJRT tunnel and is the right layout anyway: the
    buckets are consumed on device. Entries past ``cap`` within a list
    land in a sacrificial overflow slot and are dropped. Returns payloads
    shaped ``[nlist, cap, ...]`` plus ``ids [nlist, cap]`` (−1 = pad).
    """
    n = lists.shape[0]
    order = jnp.argsort(lists, stable=True)
    sl = jnp.take(lists, order)
    starts = jnp.searchsorted(sl, jnp.arange(nlist, dtype=sl.dtype))
    rank = jnp.arange(n) - jnp.take(starts, sl)
    pos = jnp.where(rank < cap, sl * cap + rank, nlist * cap)
    out = []
    for arr in payloads:
        tail = arr.shape[1:]
        buf = jnp.zeros((nlist * cap + 1,) + tail, arr.dtype)
        buf = buf.at[pos].set(jnp.take(arr, order, axis=0))
        out.append(buf[:-1].reshape((nlist, cap) + tail))
    ids = jnp.full((nlist * cap + 1,), -1, jnp.int32).at[pos].set(
        order.astype(jnp.int32)
    )
    return tuple(out), ids[:-1].reshape(nlist, cap)


# Affected-member rows processed per device round during rebalance:
# bounds the transient f32 member block (~1 GB at d=128) so rebalancing
# never doubles the resident corpus (the one-shot form OOM'd at 16M).
_REBALANCE_BLOCK_ROWS = 2_097_152


def _rebalance_pass(
    lists_np: np.ndarray,
    coarse_np: np.ndarray,
    nlist: int,
    member_vectors,
    *,
    target_max,
    default_target: int,
    min_size: int,
    max_iters: int,
    seed: int,
):
    """One split/retire/remap/reassign rebalance pass — the ONE shared
    implementation behind :meth:`_IVFScanBase._rebalance_once` and
    :meth:`vq_tpu.ivf.IVFPQIndex._rebalance_once` (storage/re-encode
    specifics stay with the callers).

    ``member_vectors(sorted_rows) -> [len, d] f32`` must read
    PRE-mutation state. Returns ``None`` when nothing needs doing, else
    a dict with the new host-side ``coarse_new``/``lists`` plus the
    affected ``rows`` (sorted unique) and their ``new_lists`` for the
    caller's re-encode step (done block-wise — see
    ``_REBALANCE_BLOCK_ROWS``; no full affected-member matrix is ever
    materialized).

    Splits draw part centroids from a bounded member subsample so each
    distinct part count compiles exactly one lloyd program (remote TPU
    compiles cost minutes); the subsample holds at least 8x the part
    count (lloyd requires n >= k even for lists longer than
    target_max**2).
    """
    counts = np.bincount(lists_np, minlength=nlist)
    if target_max is None:
        target_max = default_target
    target_max = int(target_max)
    split_ids = np.where(counts > target_max)[0]
    retire_ids = np.setdiff1d(
        np.where((counts < int(min_size)) & (counts > 0))[0], split_ids
    )
    empty_retire = (
        np.where(counts == 0)[0] if min_size > 0 else np.array([], int)
    )
    if not (split_ids.size or retire_ids.size or empty_retire.size):
        return None

    rng = np.random.default_rng(int(seed))
    lists = lists_np.copy()
    coarse = coarse_np.copy()
    keep = np.ones(nlist, bool)
    keep[retire_ids] = False
    keep[empty_retire] = False
    extra_centroids = []
    affected = [np.where(np.isin(lists, split_ids))[0]] if (
        split_ids.size
    ) else []
    for li, l in enumerate(split_ids):
        rows = np.where(lists == l)[0]
        parts = int(-(-rows.size // target_max))
        sub_n = min(rows.size, max(target_max, 8 * parts))
        sub = rows if rows.size <= sub_n else rng.choice(
            rows, sub_n, replace=False
        )
        res = lloyd(
            member_vectors(np.sort(sub)), parts,
            max_iters=max_iters, seed=seed + 7 * li, init="kmeans++",
        )
        part_c = np.asarray(res.centroids)
        coarse[l] = part_c[0]  # part 0 reuses slot l
        if parts > 1:
            extra_centroids.append(part_c[1:])
    coarse_full = (
        np.concatenate([coarse] + extra_centroids, axis=0)
        if extra_centroids else coarse
    )
    for l in retire_ids:
        affected.append(np.where(lists == l)[0])

    # Compact retired slots out of the id space.
    keep_full = np.ones(coarse_full.shape[0], bool)
    keep_full[:nlist] = keep
    remap = np.cumsum(keep_full) - 1  # old id -> new id
    coarse_new = coarse_full[keep_full]
    lists = remap[lists]

    rows = new_lists = None
    if affected:
        rows = np.unique(np.concatenate(affected))
        # Reassign in ROW BLOCKS: the one-shot form materialized every
        # affected row as a single f32 array next to the resident pool
        # (round-5 16M-row OOM: ~10M affected rows = 5 GB f32 + 4.3 GB
        # pool). Blocks bound the transient to ~1 GB; callers re-fetch
        # members block-wise for their own re-encode passes.
        cdev = jnp.asarray(coarse_new, jnp.float32)
        parts = []
        for s in range(0, rows.size, _REBALANCE_BLOCK_ROWS):
            xb = member_vectors(rows[s:s + _REBALANCE_BLOCK_ROWS])
            nlb, _ = assign(xb, cdev)
            parts.append(np.asarray(nlb))
        new_lists = (
            np.concatenate(parts) if len(parts) > 1 else parts[0]
        )
        lists[rows] = new_lists
    return {
        "split": int(split_ids.size),
        "retired": int(retire_ids.size + empty_retire.size),
        "coarse_new": coarse_new,
        "lists": lists,
        "rows": rows,
        "new_lists": new_lists,
        # old list id -> new id (-1 = retired); the chunk pool relabels
        # its chains with this instead of repacking the whole corpus.
        "remap_old": np.where(keep, remap[:nlist], -1).astype(np.int32),
    }


class _IVFScanBase:
    """Shared plumbing for the raw-row / SQ-row IVF variants:
    chunk-pool storage (:class:`vq_tpu.ivf_pool.ChunkPool`), occupancy
    stats, and the coarse-probe search driver. Subclasses declare their
    per-row payloads (:meth:`_payload_specs`) and how a probed bucket is
    scored."""

    # Whether _reencode_rows consumes the member vectors; raw-row
    # variants skip the per-block f32 gather during rebalance.
    _reencode_needs_x = True

    def __init__(
        self, coarse_centroids, *, metric, max_list_size,
        chunk_rows: int = 256,
    ):
        if metric not in ("l2", "dot"):
            raise InvalidParameter("metric", "must be 'l2' or 'dot'")
        self.metric = metric
        self.coarse = jnp.asarray(coarse_centroids, jnp.float32)
        if self.coarse.ndim != 2 or self.coarse.shape[0] == 0:
            raise InvalidParameter(
                "coarse_centroids", "expected a non-empty [nlist, d] matrix"
            )
        self.max_list_size = max_list_size
        self.chunk_rows = int(chunk_rows)
        self._flat_lists: Optional[jnp.ndarray] = None  # [n] i32 (device)
        self._pool: Optional[ChunkPool] = None
        self._buckets = None

    def _payload_specs(self) -> dict:
        raise NotImplementedError

    def _pool_append(self, lists, payloads: dict) -> None:
        if self._pool is None:
            self._pool = ChunkPool(
                self._payload_specs(), self.nlist,
                chunk_rows=self.chunk_rows,
                max_list_size=self.max_list_size,
            )
        self._pool.append(lists, payloads)
        self._buckets = None

    def reserve(self, rows: int) -> None:
        """Preallocate storage for ``rows`` total vectors so every
        ``add`` scatters into place without a doubling copy — at 10M+
        rows the copy is the difference between fitting and OOM."""
        if self._pool is None:
            self._pool = ChunkPool(
                self._payload_specs(), self.nlist,
                chunk_rows=self.chunk_rows,
                max_list_size=self.max_list_size,
            )
        self._pool.reserve(int(rows))

    @property
    def nlist(self) -> int:
        return int(self.coarse.shape[0])

    @property
    def dim(self) -> int:
        return int(self.coarse.shape[1])

    @property
    def ntotal(self) -> int:
        return 0 if self._flat_lists is None else int(self._flat_lists.shape[0])

    def _append_lists(self, lists: jnp.ndarray) -> None:
        self._flat_lists = (
            lists if self._flat_lists is None
            else jnp.concatenate([self._flat_lists, lists])
        )
        self._buckets = None

    def remove_ids(self, ids) -> int:
        """Remove stored vectors by position; remaining vectors renumber
        sequentially (faiss ``remove_ids`` contract). Only lists that
        contained removed rows repack their chunks."""
        from vq_tpu.search import _removal_keep_mask, _compact_rows

        if self._flat_lists is None:
            raise EmptyInput("index is empty")
        mask = _removal_keep_mask(ids, self.ntotal)
        mask_np = np.asarray(mask)
        removed_idx = np.where(~mask_np)[0]
        lists_np = np.asarray(self._flat_lists)
        (self._flat_lists,) = _compact_rows(mask, self._flat_lists)
        self._pool.remove(removed_idx, lists_np)
        self._compact_extra(mask)
        self._buckets = None
        return int(removed_idx.size)

    def _compact_extra(self, mask) -> None:
        """Hook for per-row storage OUTSIDE the pool (binary's kept
        corpus); the pool itself compacts in :meth:`remove_ids`."""

    _merge_attrs: tuple = ()

    def _merge_arrays(self, other):
        return ()

    def _merge_extra(self, other) -> None:
        """Hook for non-pool storage moves (binary's kept corpus)."""

    def merge_from(self, other) -> int:
        """Move every vector of ``other`` into this index (faiss IVF
        ``merge_from``: same coarse quantizer and coding parameters; the
        stored codes are copied, never re-encoded, and ``other`` is left
        empty). Returns the number of vectors moved."""
        from vq_tpu.search import _merge_check

        _merge_check(
            self, other, attrs=("metric", *self._merge_attrs),
            arrays=(
                ("coarse centroids", self.coarse, other.coarse),
                *self._merge_arrays(other),
            ),
        )
        moved = other.ntotal
        if moved:
            self._pool_append(
                other._flat_lists, other._pool.to_flat()
            )
            self._merge_extra(other)
            self._append_lists(other._flat_lists)
        other._flat_lists = None
        other._pool = None
        other._buckets = None
        return moved

    def search_and_reconstruct(self, queries, k: int = 10, **kw):
        """Search plus the decoded vector of every hit — ``(ids, values,
        vectors [Q, k, d])``; padded ``-1`` ids yield zero rows."""
        from vq_tpu.search import _search_and_reconstruct

        return _search_and_reconstruct(self, queries, k, **kw)

    def bucket_stats(self) -> dict:
        """Occupancy diagnostics (same fields as ``IVFPQIndex``).

        ``cap`` is the searched rows per probed list (``max_list_size``
        truncation applies at search, rows past it stay stored);
        ``overflow_dropped`` counts rows past cap — unsearchable, same
        contract as the old padded layout which physically dropped
        them. ``padding_waste`` is now a probe-COST metric (fraction of
        per-probe fetch slots that are dead); storage slack is the
        pool's ``slack_rows``."""
        if self._flat_lists is None:
            return {"ntotal": 0}
        counts = self._pool.lens_h
        cap = self._pool.cap
        return {
            "ntotal": self.ntotal,
            "nlist": self.nlist,
            "cap": cap,
            "min": int(counts.min()),
            "mean": float(counts.mean()),
            "max": int(counts.max()),
            "empty_lists": int((counts == 0).sum()),
            "overflow_dropped": int(np.maximum(counts - cap, 0).sum()),
            "padding_waste": float(
                1.0 - int(np.minimum(counts, cap).sum()) / (self.nlist * cap)
            ),
            **self._pool.stats(),
        }

    def rebalance(
        self,
        *,
        target_max: Optional[int] = None,
        min_size: int = 0,
        max_iters: int = 8,
        seed: int = 0,
        rounds: int = 3,
    ) -> dict:
        """Split overfull lists and retire underfull ones.

        Probe cost and padded-bucket memory both track the LARGEST list
        (``nlist × cap``), so a skewed partition taxes every query. Same
        algorithm as :meth:`vq_tpu.ivf.IVFPQIndex.rebalance`: each list
        longer than ``target_max`` is split by k-means on a fixed-size
        member subsample (one jit compile per part count), lists smaller
        than ``min_size`` are retired, and all affected members are
        reassigned in one global nearest-centroid pass — exact for
        IVF-Flat (rows are stored raw), adding at most the existing
        quantization error for IVF-SQ (members reconstruct from their
        codes before re-encoding against the new centroid). Runs up to
        ``rounds`` passes; ``target_max`` defaults to ``max_list_size``
        (or 2× the mean list size).
        """
        if self._flat_lists is None:
            raise EmptyInput("index is empty — add() vectors first")
        total_split = total_retired = 0
        for r in range(max(1, int(rounds))):
            info = self._rebalance_once(
                target_max=target_max,
                min_size=min_size if r == 0 else 0,
                max_iters=max_iters,
                seed=seed + 1000 * r,
            )
            total_split += info["split"]
            total_retired += info["retired"]
            if info["split"] == 0 and info["retired"] == 0:
                break
        return {
            "split": total_split,
            "retired": total_retired,
            "new_nlist": self.nlist,
        }

    def _rebalance_once(self, *, target_max, min_size, max_iters, seed) -> dict:
        lists_np = np.asarray(self._flat_lists)
        counts = np.bincount(lists_np, minlength=self.nlist)
        out = _rebalance_pass(
            lists_np, np.array(self.coarse), self.nlist,
            self._member_vectors,
            target_max=target_max,
            default_target=self.max_list_size or int(
                max(8, 2 * max(1.0, counts.mean()))
            ),
            min_size=min_size, max_iters=max_iters, seed=seed,
        )
        if out is None:
            return {"split": 0, "retired": 0, "new_nlist": self.nlist}
        pool = self._pool
        new_nlist = out["coarse_new"].shape[0]
        if out["rows"] is not None:
            # Chunk-wise storage move, O(affected), in ROW BLOCKS (the
            # one-shot gather of every mover OOM'd at 16M): per block,
            # gather the movers' payloads from PRE-mutation pool state
            # (re-encoded where the coding depends on the list, else
            # straight from the pool); then free the emptied lists'
            # chunks, relabel surviving chains, and scatter the blocks
            # back. Payload blocks stay device-resident between the two
            # phases — bf16/u8 codes, not f32 members.
            rows_np, nl_np = out["rows"], out["new_lists"]
            blk = _REBALANCE_BLOCK_ROWS
            blocks = []
            for s in range(0, rows_np.size, blk):
                rb_np = rows_np[s:s + blk]
                rb = jnp.asarray(rb_np, jnp.int32)
                xb = (
                    self._member_vectors(rb_np)
                    if self._reencode_needs_x else None
                )
                pb = self._reencode_rows(
                    rb_np, xb, nl_np[s:s + blk], out["coarse_new"]
                ) or {}
                for name in pool.specs:
                    if name not in pb:
                        pb[name] = pool.gather_rows(name, rb)
                blocks.append(
                    (rb, jnp.asarray(nl_np[s:s + blk], jnp.int32), pb)
                )
            pool.free_lists(np.unique(lists_np[rows_np]))
            pool.relabel_lists(out["remap_old"], new_nlist)
            for rb, nlb, pb in blocks:
                pool.append(nlb, pb, row_ids=rb)
        else:
            pool.relabel_lists(out["remap_old"], new_nlist)
        self.coarse = jnp.asarray(out["coarse_new"], jnp.float32)
        self._flat_lists = jnp.asarray(out["lists"])
        self._buckets = None
        return {
            "split": out["split"],
            "retired": out["retired"],
            "new_nlist": self.nlist,
        }

    def _check_query(self, queries) -> jnp.ndarray:
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=q.shape[1])
        return q

    def search(
        self,
        queries,
        k: int = 10,
        *,
        nprobe: int = 8,
        use_pallas: Optional[bool] = None,
        interpret: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k ``(ids, values)``. Values are squared-L2 distances
        (ascending, ``inf`` pad) for ``metric="l2"`` and inner-product
        scores (descending, ``-inf`` pad) for ``metric="dot"``; ids of −1
        mean fewer than k candidates existed in the probed lists.

        ``use_pallas`` (default: auto — on for the TPU backend) routes the
        probe through the fused scalar-prefetch kernel instead of the XLA
        bucket gather; results are identical."""
        q = self._check_query(queries)
        fn, arrays = self._search_core(
            int(k), nprobe=nprobe, use_pallas=use_pallas,
            interpret=interpret,
        )
        return fn(q, *arrays)

    def _search_core(
        self,
        k: int,
        *,
        nprobe: int = 8,
        use_pallas: Optional[bool] = None,
        interpret: bool = False,
    ):
        """The search as ``(fn, arrays)`` with ``fn(q, *arrays)`` fully
        traceable — :meth:`search` is one eager call of it; the serving
        pipeline (:class:`vq_tpu.serving.BatchPipeline`) scans it over
        many query batches in a single dispatch. Arrays are passed as
        arguments, not closed over, so jitted callers don't bake the
        bucket storage into the program as constants."""
        if self._flat_lists is None:
            raise EmptyInput("index is empty — add() vectors first")
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        buckets = self._build_buckets()
        names = tuple(sorted(buckets))
        arrays = tuple(buckets[n] for n in names)
        k = int(k)
        nprobe = min(int(nprobe), self.nlist)
        ce = int(buckets["chains"].shape[1]) * int(buckets["ids"].shape[1])
        k_eff = min(k, nprobe * ce)
        use_pallas, interpret = bool(use_pallas), bool(interpret)
        metric = self.metric

        def fn(q, *arrs):
            b = dict(zip(names, arrs))
            ids, dist = self._scan(q, b, nprobe, k_eff, use_pallas, interpret)
            ids = jnp.where(jnp.isinf(dist), -1, ids)
            if ids.shape[1] < k:  # pool smaller than k: pad out the contract
                pad = k - ids.shape[1]
                ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
                dist = jnp.pad(
                    dist, ((0, 0), (0, pad)), constant_values=jnp.inf
                )
            if metric == "dot":
                dist = -dist  # back to descending scores; pads become -inf
            return ids, dist

        return fn, arrays

    def range_search(
        self,
        queries,
        radius: float,
        *,
        nprobe: int = 8,
        max_results: int = 1024,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """All stored rows within ``radius`` of each query **among the
        probed lists** (the faiss IVF ``range_search`` contract: recall
        is bounded by the probe set — raise ``nprobe`` for completeness).

        Same shape contract as the flat indexes' ``range_search``:
        ``(ids, values, counts)`` with ``ids``/``values`` the best
        ``max_results`` hits (``-1`` / ``inf`` pads; ``-inf`` scores for
        ``dot``) and ``counts[q]`` the TRUE number of probed hits. A hit
        is ``value <= radius`` for L2, ``score >= radius`` for ``dot``.
        """
        if self._flat_lists is None:
            raise EmptyInput("index is empty — add() vectors first")
        if int(max_results) < 1:
            raise InvalidParameter("max_results", "must be >= 1")
        buckets = self._build_buckets()
        q = self._check_query(queries)
        nprobe = min(int(nprobe), self.nlist)
        ce = int(buckets["chains"].shape[1]) * int(buckets["ids"].shape[1])
        fetch = min(int(max_results), nprobe * ce)
        r = float(radius)
        r_internal = -r if self.metric == "dot" else r
        ids, d, counts = self._range(
            q, buckets, nprobe, fetch, jnp.float32(r_internal)
        )
        if ids.shape[1] < max_results:
            pad = int(max_results) - ids.shape[1]
            ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            d = jnp.pad(d, ((0, 0), (0, pad)), constant_values=jnp.inf)
        if self.metric == "dot":
            d = -d  # back to descending scores; pads become -inf
        return ids, d, counts


class IVFFlatIndex(_IVFScanBase):
    """Inverted-file index over raw rows (the faiss ``IndexIVFFlat``
    analog): probed distances are exact, storage is d·4 bytes/vector —
    or half that with ``store_dtype="bfloat16"`` (TPU-native) /
    ``"float16"``, trading ≤1e-2-relative distance error for HBM.
    """

    def __init__(
        self,
        coarse_centroids,
        *,
        metric: str = "l2",
        store_dtype: str = "float32",
        max_list_size: Optional[int] = None,
        chunk_rows: int = 256,
    ):
        super().__init__(
            coarse_centroids, metric=metric, max_list_size=max_list_size,
            chunk_rows=chunk_rows,
        )
        if store_dtype not in _STORE_DTYPES:
            raise InvalidParameter(
                "store_dtype",
                "must be 'float32', 'bfloat16', or 'float16'",
            )
        self.store_dtype = store_dtype

    @classmethod
    def train(
        cls,
        training_data,
        nlist: int,
        *,
        max_iters: int = 10,
        seed: int = 42,
        metric: str = "l2",
        store_dtype: str = "float32",
        max_list_size: Optional[int] = None,
        spherical: bool = False,
        chunk_rows: int = 256,
    ) -> "IVFFlatIndex":
        """Fit the coarse partition (k-means++-seeded Lloyd's)."""
        x = jnp.asarray(training_data, jnp.float32)
        res = lloyd(x, nlist, max_iters=max_iters, seed=seed,
                    init="kmeans++", spherical=spherical)
        return cls(
            res.centroids, metric=metric, store_dtype=store_dtype,
            max_list_size=max_list_size, chunk_rows=chunk_rows,
        )

    def _payload_specs(self) -> dict:
        return {
            "rows": ((self.dim,), _STORE_DTYPES[self.store_dtype]),
            "sqn": ((), jnp.float32),
        }

    def add(self, vectors) -> None:
        """Coarse-assign and scatter a batch of raw vectors into the
        pool (in place — peak memory is O(batch) above the stored
        corpus; call :meth:`reserve` first for multi-GB builds)."""
        x = jnp.asarray(vectors)
        if x.dtype not in (jnp.float16, jnp.bfloat16):
            x = x.astype(jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x.shape[1])
        lists, _ = assign(x, self.coarse)
        # Distances are computed against the STORED rows, so norms come
        # from the (possibly down-cast) stored values — values returned
        # by search are exact for what the index holds.
        rows = x.astype(_STORE_DTYPES[self.store_dtype])
        rows_f32 = rows.astype(jnp.float32)
        self._pool_append(lists, {
            "rows": rows, "sqn": jnp.sum(rows_f32 * rows_f32, axis=-1),
        })
        self._append_lists(lists)

    _merge_attrs = ("store_dtype",)

    def _member_vectors(self, rows_idx: np.ndarray) -> jnp.ndarray:
        return self._pool.gather_rows(
            "rows", jnp.asarray(rows_idx, jnp.int32)
        ).astype(jnp.float32)

    _reencode_needs_x = False

    def _reencode_rows(self, rows_idx, x, new_lists, coarse_new):
        return None  # raw rows don't depend on their list assignment

    def _build_buckets(self) -> dict:
        if self._buckets is None:
            self._buckets = {
                "rows": self._pool.data["rows"],
                "sqn": self._pool.data["sqn"],
                "ids": self._pool.slot_ids,
                "chains": self._pool.chains_search(),
            }
        return self._buckets

    def _scan(self, q, buckets, nprobe, k, use_pallas=False, interpret=False):
        return _ivf_flat_search_jit(
            q, self.coarse, buckets["rows"], buckets["sqn"],
            buckets["ids"], buckets["chains"], nprobe, k, self._pool.cap,
            self.metric, use_pallas, interpret,
        )

    def _range(self, q, buckets, nprobe, fetch, radius):
        return _ivf_flat_range_jit(
            q, self.coarse, buckets["rows"], buckets["sqn"],
            buckets["ids"], buckets["chains"], nprobe, fetch,
            self._pool.cap, radius, self.metric,
        )

    def reconstruct(self, ids) -> jnp.ndarray:
        """Stored rows for ids (exact up to ``store_dtype`` rounding)."""
        if self._pool is None or self._pool.n_rows == 0:
            raise EmptyInput("index is empty")
        return self._pool.gather_rows(
            "rows", jnp.asarray(ids, jnp.int32)
        ).astype(jnp.float32)

    def save(self, path: str) -> str:
        """Checkpoint (row-flat format, compatible across layouts —
        gathering the pool into id order peaks at 2× the row storage)."""
        if self._pool is not None and self._pool.n_rows:
            rows = np.asarray(self._pool.to_flat(["rows"])["rows"])
        else:
            rows = np.zeros((0, self.dim), np.float32)
        if self.store_dtype == "bfloat16" and rows.shape[0]:
            rows = rows.view(np.uint16)  # npz has no bf16: raw bits
        return _to_npz(
            path,
            "ivfflat_index",
            {
                "metric": self.metric,
                "store_dtype": self.store_dtype,
                "max_list_size": self.max_list_size,
            },
            {
                "coarse": np.asarray(self.coarse),
                "rows": rows,
                "lists": (
                    np.asarray(self._flat_lists)
                    if self._flat_lists is not None
                    else np.zeros((0,), np.int32)
                ),
            },
        )

    @classmethod
    def load(cls, path: str) -> "IVFFlatIndex":
        kind, config, arrays = _from_npz(path)
        if kind != "ivfflat_index":
            raise InvalidData(
                f"expected an ivfflat_index checkpoint, got {kind!r}"
            )
        idx = cls(
            arrays["coarse"],
            metric=config["metric"],
            store_dtype=config["store_dtype"],
            max_list_size=config.get("max_list_size"),
        )
        if arrays["rows"].shape[0]:
            rows = arrays["rows"]
            if config["store_dtype"] == "bfloat16":
                rows = rows.view(jnp.bfloat16.dtype)
            rows = jnp.asarray(rows)
            rows_f32 = rows.astype(jnp.float32)
            lists = jnp.asarray(arrays["lists"])
            idx._pool_append(lists, {
                "rows": rows,
                "sqn": jnp.sum(rows_f32 * rows_f32, axis=-1),
            })
            idx._flat_lists = lists
        return idx

    def __repr__(self) -> str:
        return (
            f"IVFFlatIndex(nlist={self.nlist}, ntotal={self.ntotal}, "
            f"dim={self.dim}, metric={self.metric!r}, "
            f"store_dtype={self.store_dtype!r})"
        )


class IVFSQIndex(_IVFScanBase):
    """Inverted-file index over per-dimension SQ8 codes (the faiss
    ``IndexIVFScalarQuantizer`` analog): d bytes/vector + one stored
    norm, exact decoded-row distances. ``by_residual=True`` (default)
    codes ``x − coarse_centroid(x)`` — tighter per-dim ranges, lower
    quantization error — and search adds the centroid back analytically.
    """

    def __init__(
        self,
        coarse_centroids,
        sq: PerDimScalarQuantizer,
        *,
        metric: str = "l2",
        by_residual: bool = True,
        max_list_size: Optional[int] = None,
        chunk_rows: int = 256,
    ):
        super().__init__(
            coarse_centroids, metric=metric, max_list_size=max_list_size,
            chunk_rows=chunk_rows,
        )
        if not isinstance(sq, PerDimScalarQuantizer):
            raise InvalidParameter(
                "sq", "IVFSQIndex requires a PerDimScalarQuantizer"
            )
        if sq.dim != self.dim:
            raise DimensionMismatch(expected=self.dim, found=sq.dim)
        self.sq = sq
        self.by_residual = bool(by_residual)

    def _payload_specs(self) -> dict:
        return {
            "codes": ((self.dim,), jnp.uint8),
            "sqn": ((), jnp.float32),
        }

    @classmethod
    def train(
        cls,
        training_data,
        nlist: int,
        levels: int = 256,
        *,
        max_iters: int = 10,
        seed: int = 42,
        metric: str = "l2",
        by_residual: bool = True,
        max_list_size: Optional[int] = None,
        spherical: bool = False,
    ) -> "IVFSQIndex":
        """Fit the coarse partition, then per-dimension SQ ranges on the
        residuals (or the raw vectors when ``by_residual=False``)."""
        x = jnp.asarray(training_data, jnp.float32)
        res = lloyd(x, nlist, max_iters=max_iters, seed=seed,
                    init="kmeans++", spherical=spherical)
        sq_train = (
            x - pick_rows(res.centroids, res.assignments)
            if by_residual else x
        )
        sq = PerDimScalarQuantizer.from_data(sq_train, levels)
        return cls(
            res.centroids, sq, metric=metric, by_residual=by_residual,
            max_list_size=max_list_size,
        )

    def add(self, vectors) -> None:
        """Coarse-assign, SQ-encode the residual, and append a batch."""
        x = jnp.asarray(vectors)
        if x.dtype not in (jnp.float16, jnp.bfloat16):
            x = x.astype(jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x.shape[1])
        lists_j, _ = assign(x, self.coarse)
        enc_in = (
            x - pick_rows(self.coarse, lists_j)
            if self.by_residual else x
        )
        codes = self.sq.quantize(enc_in.astype(jnp.float32))
        y = self.sq.dequantize(codes)
        self._pool_append(lists_j, {
            "codes": codes, "sqn": jnp.sum(y * y, axis=-1),
        })
        self._append_lists(lists_j)

    _merge_attrs = ("by_residual",)

    def _merge_arrays(self, other: "IVFSQIndex"):
        return (
            ("SQ lo", self.sq._lo, other.sq._lo),
            ("SQ hi", self.sq._hi, other.sq._hi),
        )

    def merge_from(self, other) -> int:
        if isinstance(other, IVFSQIndex) and (
            self.sq._levels != other.sq._levels
        ):
            raise InvalidData("cannot merge: SQ levels differ")
        return super().merge_from(other)

    def _member_vectors(self, rows_idx: np.ndarray) -> jnp.ndarray:
        # Reconstruct from codes + the CURRENT (pre-rebalance) centroid —
        # adds at most the quantization error already present.
        return self.reconstruct(rows_idx)

    def _reencode_rows(self, rows_idx, x, new_lists, coarse_new):
        enc_in = (
            x - jnp.asarray(coarse_new, jnp.float32)[jnp.asarray(new_lists)]
            if self.by_residual else x
        )
        codes = self.sq.quantize(enc_in.astype(jnp.float32))
        y = self.sq.dequantize(codes)
        return {"codes": codes, "sqn": jnp.sum(y * y, axis=-1)}

    def _build_buckets(self) -> dict:
        if self._buckets is None:
            self._buckets = {
                "codes": self._pool.data["codes"],
                "sqn": self._pool.data["sqn"],
                "ids": self._pool.slot_ids,
                "chains": self._pool.chains_search(),
            }
        return self._buckets

    def _scan(self, q, buckets, nprobe, k, use_pallas=False, interpret=False):
        return _ivf_sq_search_jit(
            q, self.coarse, self.sq.mins, self.sq.steps,
            buckets["codes"], buckets["sqn"], buckets["ids"],
            buckets["chains"], nprobe, k, self._pool.cap, self.metric,
            self.by_residual, use_pallas, interpret,
        )

    def _range(self, q, buckets, nprobe, fetch, radius):
        return _ivf_sq_range_jit(
            q, self.coarse, self.sq.mins, self.sq.steps,
            buckets["codes"], buckets["sqn"], buckets["ids"],
            buckets["chains"], nprobe, fetch, self._pool.cap, radius,
            self.metric, self.by_residual,
        )

    def reconstruct(self, ids) -> jnp.ndarray:
        """Decoded rows for stored ids (residual decode + centroid)."""
        if self._pool is None or self._pool.n_rows == 0:
            raise EmptyInput("index is empty")
        ids = jnp.asarray(ids, jnp.int32)
        y = self.sq.dequantize(self._pool.gather_rows("codes", ids))
        if self.by_residual:
            y = y + jnp.take(
                self.coarse, jnp.take(self._flat_lists, ids), axis=0
            )
        return y

    def save(self, path: str) -> str:
        return _to_npz(
            path,
            "ivfsq_index",
            {
                "metric": self.metric,
                "by_residual": self.by_residual,
                "levels": self.sq.levels,
                "max_list_size": self.max_list_size,
            },
            {
                "coarse": np.asarray(self.coarse),
                "mins": np.asarray(self.sq.mins),
                "maxs": np.asarray(self.sq.maxs),
                **(
                    {
                        k: np.asarray(v)
                        for k, v in self._pool.to_flat().items()
                    }
                    if self._pool is not None and self._pool.n_rows
                    else {
                        "codes": np.zeros((0, self.dim), np.uint8),
                        "sqn": np.zeros((0,), np.float32),
                    }
                ),
                "lists": (
                    np.asarray(self._flat_lists)
                    if self._flat_lists is not None
                    else np.zeros((0,), np.int32)
                ),
            },
        )

    @classmethod
    def load(cls, path: str) -> "IVFSQIndex":
        kind, config, arrays = _from_npz(path)
        if kind != "ivfsq_index":
            raise InvalidData(
                f"expected an ivfsq_index checkpoint, got {kind!r}"
            )
        sq = PerDimScalarQuantizer(
            arrays["mins"], arrays["maxs"], config["levels"]
        )
        idx = cls(
            arrays["coarse"], sq,
            metric=config["metric"],
            by_residual=config["by_residual"],
            max_list_size=config.get("max_list_size"),
        )
        if arrays["codes"].shape[0]:
            lists = jnp.asarray(arrays["lists"])
            idx._pool_append(lists, {
                "codes": jnp.asarray(arrays["codes"]),
                "sqn": jnp.asarray(arrays["sqn"]),
            })
            idx._flat_lists = lists
        return idx

    def __repr__(self) -> str:
        return (
            f"IVFSQIndex(nlist={self.nlist}, ntotal={self.ntotal}, "
            f"dim={self.dim}, levels={self.sq.levels}, "
            f"residual={self.by_residual}, metric={self.metric!r})"
        )


class IVFRQIndex(_IVFScanBase):
    """Inverted-file index over additive residual-quantizer codes (the
    faiss ``IndexIVFResidualQuantizer`` analog): S bytes/vector (k ≤ 256)
    plus two stored f32 cross-terms per row (``||ŷ||²`` and ``c_list·ŷ``
    — additive codes carry norm/cross terms per-stage tables can't
    express, and storing ``c_list·ŷ`` keeps the search tables
    probe-independent). Probed distances are exact distances to the
    decoded rows. Completes the IVF coding ladder between IVF-PQ (same
    bytes, coordinate-blocked codes) and IVF-SQ (d bytes): at equal code
    bytes RQ reconstructs better on data without coordinate-aligned
    structure, at identical probe-scan cost shape.

    ``beam`` controls encode quality at :meth:`add` (beam-search over
    stage combinations; 1 = greedy).
    """

    def __init__(
        self,
        coarse_centroids,
        rq,
        *,
        metric: str = "l2",
        by_residual: bool = True,
        beam: int = 1,
        max_list_size: Optional[int] = None,
        chunk_rows: int = 256,
    ):
        from vq_tpu.models.rq import ResidualQuantizer

        super().__init__(
            coarse_centroids, metric=metric, max_list_size=max_list_size,
            chunk_rows=chunk_rows,
        )
        if not isinstance(rq, ResidualQuantizer):
            raise InvalidParameter(
                "rq", "IVFRQIndex requires a ResidualQuantizer"
            )
        if rq.dim != self.dim:
            raise DimensionMismatch(expected=self.dim, found=rq.dim)
        if int(beam) < 1:
            raise InvalidParameter("beam", "must be >= 1")
        self.rq = rq
        self.by_residual = bool(by_residual)
        self.beam = int(beam)

    def _payload_specs(self) -> dict:
        code_dt = (
            jnp.uint8 if self.rq.num_centroids <= 256 else jnp.int32
        )
        return {
            "codes": ((self.rq.num_stages,), code_dt),
            "sqn": ((), jnp.float32),
            "cross": ((), jnp.float32),
        }

    @classmethod
    def train(
        cls,
        training_data,
        nlist: int,
        num_stages: int,
        num_centroids: int = 256,
        *,
        max_iters: int = 10,
        seed: int = 42,
        metric: str = "l2",
        by_residual: bool = True,
        beam: int = 1,
        max_list_size: Optional[int] = None,
        spherical: bool = False,
    ) -> "IVFRQIndex":
        """Fit the coarse partition, then RQ stage codebooks on the
        residuals (or raw vectors when ``by_residual=False``)."""
        from vq_tpu.models.rq import ResidualQuantizer, rq_train

        x = jnp.asarray(training_data, jnp.float32)
        res = lloyd(x, nlist, max_iters=max_iters, seed=seed,
                    init="kmeans++", spherical=spherical)
        rq_in = (
            x - pick_rows(res.centroids, res.assignments)
            if by_residual else x
        )
        rq = ResidualQuantizer(
            codebooks=rq_train(
                rq_in, num_stages, num_centroids, max_iters=max_iters,
                seed=seed,
            )
        )
        return cls(
            res.centroids, rq, metric=metric, by_residual=by_residual,
            beam=beam, max_list_size=max_list_size,
        )

    def _encode_rows(self, x, lists_j, coarse):
        """RQ-encode residuals; returns (codes, ||ŷ||², c_list·ŷ)."""
        c = pick_rows(jnp.asarray(coarse, jnp.float32), lists_j)
        enc_in = x - c if self.by_residual else x
        codes = self.rq.encode(enc_in.astype(jnp.float32), beam=self.beam)
        y = self.rq.decode(codes)
        sqn = jnp.sum(y * y, axis=-1)
        cross = (
            jnp.sum(c * y, axis=-1) if self.by_residual
            else jnp.zeros_like(sqn)
        )
        return codes, sqn, cross

    def add(self, vectors) -> None:
        """Coarse-assign, RQ-encode the residual, and append a batch."""
        x = jnp.asarray(vectors)
        if x.dtype not in (jnp.float16, jnp.bfloat16):
            x = x.astype(jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x.shape[1])
        x = x.astype(jnp.float32)
        lists_j, _ = assign(x, self.coarse)
        codes, sqn, cross = self._encode_rows(x, lists_j, self.coarse)
        self._pool_append(
            lists_j, {"codes": codes, "sqn": sqn, "cross": cross}
        )
        self._append_lists(lists_j)

    _merge_attrs = ("by_residual",)

    def _merge_arrays(self, other: "IVFRQIndex"):
        return (("RQ codebooks", self.rq._cbs, other.rq._cbs),)

    def _member_vectors(self, rows_idx: np.ndarray) -> jnp.ndarray:
        # Reconstruct from codes + the CURRENT (pre-rebalance) centroid.
        return self.reconstruct(rows_idx)

    def _reencode_rows(self, rows_idx, x, new_lists, coarse_new):
        codes, sqn, cross = self._encode_rows(
            jnp.asarray(x, jnp.float32), jnp.asarray(new_lists), coarse_new
        )
        return {"codes": codes, "sqn": sqn, "cross": cross}

    def _build_buckets(self) -> dict:
        if self._buckets is None:
            self._buckets = {
                "codes": self._pool.data["codes"],
                "sqn": self._pool.data["sqn"],
                "cross": self._pool.data["cross"],
                "ids": self._pool.slot_ids,
                "chains": self._pool.chains_search(),
            }
        return self._buckets

    def _scan(self, q, buckets, nprobe, k, use_pallas=False, interpret=False):
        return _ivf_rq_search_jit(
            q, self.coarse, self.rq.codebooks,
            buckets["codes"], buckets["sqn"], buckets["cross"],
            buckets["ids"], buckets["chains"], nprobe, k, self._pool.cap,
            self.metric, self.by_residual, use_pallas, interpret,
        )

    def _range(self, q, buckets, nprobe, fetch, radius):
        return _ivf_rq_range_jit(
            q, self.coarse, self.rq.codebooks,
            buckets["codes"], buckets["sqn"], buckets["cross"],
            buckets["ids"], buckets["chains"], nprobe, fetch,
            self._pool.cap, radius, self.metric, self.by_residual,
        )

    def reconstruct(self, ids) -> jnp.ndarray:
        """Decoded rows for stored ids (additive decode + centroid)."""
        if self._pool is None or self._pool.n_rows == 0:
            raise EmptyInput("index is empty")
        ids = jnp.asarray(ids, jnp.int32)
        y = self.rq.decode(self._pool.gather_rows("codes", ids))
        if self.by_residual:
            y = y + jnp.take(
                self.coarse, jnp.take(self._flat_lists, ids), axis=0
            )
        return y

    def save(self, path: str) -> str:
        S = self.rq.num_stages
        return _to_npz(
            path,
            "ivfrq_index",
            {
                "metric": self.metric,
                "by_residual": self.by_residual,
                "beam": self.beam,
                "max_list_size": self.max_list_size,
            },
            {
                "coarse": np.asarray(self.coarse),
                "codebooks": np.asarray(self.rq.codebooks),
                **(
                    {
                        k: np.asarray(v)
                        for k, v in self._pool.to_flat().items()
                    }
                    if self._pool is not None and self._pool.n_rows
                    else {
                        "codes": np.zeros((0, S), np.uint8),
                        "sqn": np.zeros((0,), np.float32),
                        "cross": np.zeros((0,), np.float32),
                    }
                ),
                "lists": (
                    np.asarray(self._flat_lists)
                    if self._flat_lists is not None
                    else np.zeros((0,), np.int32)
                ),
            },
        )

    @classmethod
    def load(cls, path: str) -> "IVFRQIndex":
        from vq_tpu.models.rq import ResidualQuantizer

        kind, config, arrays = _from_npz(path)
        if kind != "ivfrq_index":
            raise InvalidData(
                f"expected an ivfrq_index checkpoint, got {kind!r}"
            )
        idx = cls(
            arrays["coarse"],
            ResidualQuantizer(codebooks=arrays["codebooks"]),
            metric=config["metric"],
            by_residual=config["by_residual"],
            beam=config.get("beam", 1),
            max_list_size=config.get("max_list_size"),
        )
        if arrays["codes"].shape[0]:
            lists = jnp.asarray(arrays["lists"])
            idx._pool_append(lists, {
                "codes": jnp.asarray(arrays["codes"]),
                "sqn": jnp.asarray(arrays["sqn"]),
                "cross": jnp.asarray(arrays["cross"]),
            })
            idx._flat_lists = lists
        return idx

    def __repr__(self) -> str:
        return (
            f"IVFRQIndex(nlist={self.nlist}, ntotal={self.ntotal}, "
            f"dim={self.dim}, stages={self.rq.num_stages}, "
            f"k={self.rq.num_centroids}, residual={self.by_residual}, "
            f"metric={self.metric!r}, beam={self.beam})"
        )

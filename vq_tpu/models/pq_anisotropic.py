"""Anisotropic (score-aware) product quantization for MIPS.

Extends PQ the way :mod:`vq_tpu.ops.kmeans_anisotropic` extends k-means
(Guo et al. 2020, "Accelerating Large-Scale Inference with Anisotropic
Vector Quantization" — the ScaNN codebook loss): with residual
``r = x - recon(codes)`` and unit direction ``x_hat = x / ||x||``, the
per-point loss

    L = ||r||^2 + (eta - 1) * (r . x_hat)^2        (eta >= 1)

up-weights error parallel to the datapoint, which is exactly the error
that perturbs every query's inner-product score for that point. ``eta = 1``
reduces to plain PQ.

Unlike the full-vector case, the parallel term couples PQ's subspaces, so:

* **Encoding** is block coordinate descent over subspaces. For subspace
  ``j`` with everything else fixed, the candidate score is

      score(c) = ||c||^2 - 2 x_j.c + (eta-1) * ((h_j.c)^2 - 2 t * (h_j.c))

  where ``h_j = x_j / ||x||`` and ``t = r.x_hat`` with block ``j``'s
  contribution removed — one ``[n, k]`` matmul per subspace (``h_j.c`` is a
  row-scaled reuse of the same matmul), same MXU dataflow as plain encode.
  ``t`` is carried incrementally across subspaces, so a full sweep is
  ``m`` matmuls, identical to one plain PQ encode.
* **Codebook updates** are exact per-cluster weighted least squares: entry
  ``(j, c)`` solves ``(N I + (eta-1) sum h h^T) c = sum x_j + (eta-1) sum
  t h`` over its assigned points — accumulated with one-hot matmuls over
  row blocks and solved as ``k`` batched ``s x s`` Cholesky systems per
  subspace. Each update is the exact blockwise minimizer, so the total
  loss is non-increasing per pass (property-tested).

The reference library has no MIPS support at all; this is a TPU-native
extension in the spirit of its CPU contemporaries (ScaNN, FAISS). Plain-PQ
semantics (lowest-index ties, HIGHEST-precision matmuls, validation as in
reference src/pq.rs:91-118) are preserved throughout.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vq_tpu.errors import DimensionMismatch, InvalidParameter
from vq_tpu.models.base import as_batch_f32, check_training_matrix
from vq_tpu.models.pq import ProductQuantizer, _adc_lookup_jit, pq_encode, pq_train
from vq_tpu.ops.kmeans_anisotropic import anisotropic_eta

__all__ = [
    "AnisotropicProductQuantizer",
    "pq_encode_anisotropic",
    "pq_refine_anisotropic",
    "pq_train_anisotropic",
    "anisotropic_pq_loss",
    "mips_adc_search",
]

_HIGHEST = jax.lax.Precision.HIGHEST

# Row-block size for the chunked scans: bounds the [B, k] score block and
# the [B, s^2] outer-product block instead of materializing [n, ...].
_DEFAULT_CHUNK = 65_536


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST,
    )


def _blocks(x2d, chunk: int):
    """Pad [n, ...] rows to a multiple of ``chunk`` -> ([nb, B, ...], valid)."""
    n = x2d.shape[0]
    b = min(int(chunk), n)
    pad = (-n) % b
    xp = jnp.pad(x2d, ((0, pad),) + ((0, 0),) * (x2d.ndim - 1))
    valid = (jnp.arange(n + pad) < n).astype(jnp.float32)
    return (
        xp.reshape((-1, b) + x2d.shape[1:]),
        valid.reshape(-1, b),
    )


def _encode_block(cb, eta, xb_b, inv_b, codes_b, T_b):
    """One coordinate-descent sweep over all m subspaces for a row block.

    ``xb_b``: [B, m, s], ``inv_b``: [B] (1/||x||, 0 for zero rows),
    ``codes_b``: [B, m] i32, ``T_b``: [B] current ``r.x_hat``.
    """
    m, k, s = cb.shape

    def body(j, carry):
        codes, T = carry
        cbj = cb[j]  # [k, s]
        xj = jax.lax.dynamic_index_in_dim(xb_b, j, 1, keepdims=False)  # [B,s]
        hj = xj * inv_b[:, None]
        cj = jax.lax.dynamic_index_in_dim(codes, j, 1, keepdims=False)  # [B]
        c_old = jnp.take(cbj, cj, axis=0)  # [B, s]
        t = T + jnp.sum(c_old * hj, axis=-1)  # block j removed from r.x_hat
        xc = _dot(xj, cbj)  # [B, k]
        hc = xc * inv_b[:, None]  # h_j . c reuses the same matmul
        cc = jnp.sum(cbj * cbj, axis=-1)  # [k]
        score = cc[None, :] - 2.0 * xc + (eta - 1.0) * (
            hc * hc - 2.0 * t[:, None] * hc
        )
        new = jnp.argmin(score, axis=-1).astype(jnp.int32)  # lowest-index ties
        c_new = jnp.take(cbj, new, axis=0)
        T = t - jnp.sum(c_new * hj, axis=-1)
        codes = jax.lax.dynamic_update_index_in_dim(codes, new, j, 1)
        return codes, T

    return jax.lax.fori_loop(0, m, body, (codes_b, T_b))


def _encode_pass(cb, eta, xb, inv, codes, T):
    def blk(carry, inp):
        xb_b, inv_b, codes_b, T_b = inp
        codes_b, T_b = _encode_block(cb, eta, xb_b, inv_b, codes_b, T_b)
        return carry, (codes_b, T_b)

    _, (codes, T) = jax.lax.scan(blk, 0, (xb, inv, codes, T))
    return codes, T


@functools.partial(jax.jit, static_argnames=("sweeps",))
def _encode_jit(xb, inv, codes, T, cb, eta, sweeps: int):
    for _ in range(sweeps):
        codes, T = _encode_pass(cb, eta, xb, inv, codes, T)
    return codes, T


@functools.partial(jax.jit, static_argnames=("iters", "sweeps"))
def _refine_jit(xb, valid, inv, codes, T, cb, eta, ridge, iters: int,
                sweeps: int):
    m, k, s = cb.shape
    eye = jnp.eye(s, dtype=jnp.float32)

    def codebook_pass(carry):
        codes, T, cb = carry

        def per_subspace(j, jc):
            cb, T = jc
            cbj = cb[j]

            def acc_blk(acc, inp):
                A, b, counts = acc
                xb_b, inv_b, codes_b, T_b, valid_b = inp
                xj = jax.lax.dynamic_index_in_dim(xb_b, j, 1, keepdims=False)
                hj = xj * inv_b[:, None]
                cj = jax.lax.dynamic_index_in_dim(
                    codes_b, j, 1, keepdims=False
                )
                c_old = jnp.take(cbj, cj, axis=0)
                t = T_b + jnp.sum(c_old * hj, axis=-1)
                onehot = jax.nn.one_hot(cj, k, dtype=jnp.float32)
                onehot = onehot * valid_b[:, None]  # padded rows excluded
                hh = (hj[:, :, None] * hj[:, None, :]).reshape(-1, s * s)
                A = A + jax.lax.dot_general(
                    onehot, hh, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HIGHEST,
                )
                rhs = xj + (eta - 1.0) * t[:, None] * hj
                b = b + jax.lax.dot_general(
                    onehot, rhs, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HIGHEST,
                )
                return (A, b, counts + jnp.sum(onehot, axis=0)), None

            init = (
                jnp.zeros((k, s * s), jnp.float32),
                jnp.zeros((k, s), jnp.float32),
                jnp.zeros((k,), jnp.float32),
            )
            (A, b, counts), _ = jax.lax.scan(
                acc_blk, init, (xb, inv, codes, T, valid)
            )
            Afull = (
                counts[:, None, None] * eye[None]
                + (eta - 1.0) * A.reshape(k, s, s)
                + ridge * eye[None]
            )
            sol = jax.vmap(
                lambda Ai, bi: jax.scipy.linalg.solve(Ai, bi, assume_a="pos")
            )(Afull, b)
            # Empty entries keep their old centroid (refinement starts from
            # a trained PQ, so genuinely dead entries stay where they were).
            new_cbj = jnp.where((counts > 0)[:, None], sol, cbj)
            cb = jax.lax.dynamic_update_index_in_dim(cb, new_cbj, j, 0)

            def upd_blk(carry, inp):
                xb_b, inv_b, codes_b, T_b = inp
                xj = jax.lax.dynamic_index_in_dim(xb_b, j, 1, keepdims=False)
                hj = xj * inv_b[:, None]
                cj = jax.lax.dynamic_index_in_dim(
                    codes_b, j, 1, keepdims=False
                )
                t = T_b + jnp.sum(jnp.take(cbj, cj, axis=0) * hj, axis=-1)
                T_b = t - jnp.sum(jnp.take(new_cbj, cj, axis=0) * hj, axis=-1)
                return carry, T_b

            _, T = jax.lax.scan(upd_blk, 0, (xb, inv, codes, T))
            return cb, T

        cb, T = jax.lax.fori_loop(0, m, per_subspace, (cb, T))
        return codes, T, cb

    def one_iter(_, carry):
        codes, T, cb = carry
        for _s in range(sweeps):
            codes, T = _encode_pass(cb, eta, xb, inv, codes, T)
        return codebook_pass((codes, T, cb))

    codes, T, cb = jax.lax.fori_loop(0, iters, one_iter, (codes, T, cb))
    # Final re-encode so the returned codes are optimal for the returned
    # codebooks (and the loss invariant T stays exact).
    for _s in range(sweeps):
        codes, T = _encode_pass(cb, eta, xb, inv, codes, T)
    return cb, codes, T


@jax.jit
def _init_T_jit(xb, inv, codes, cb):
    """T = (x - recon) . x_hat per row, computed blockwise."""
    m = cb.shape[0]

    def blk(carry, inp):
        xb_b, inv_b, codes_b = inp
        recon = cb[jnp.arange(m)[None, :], codes_b]  # [B, m, s]
        r = xb_b - recon
        T_b = jnp.sum(
            r.reshape(r.shape[0], -1)
            * (xb_b.reshape(xb_b.shape[0], -1) * inv_b[:, None]),
            axis=-1,
        )
        return carry, T_b

    _, T = jax.lax.scan(blk, 0, (xb, inv, codes))
    return T


@jax.jit
def _loss_jit(xb, valid, inv, codes, cb, eta):
    m = cb.shape[0]

    def blk(acc, inp):
        xb_b, valid_b, inv_b, codes_b = inp
        recon = cb[jnp.arange(m)[None, :], codes_b]
        r = (xb_b - recon).reshape(xb_b.shape[0], -1)
        xf = xb_b.reshape(xb_b.shape[0], -1)
        par = jnp.sum(r * xf, axis=-1) * inv_b
        per_row = jnp.sum(r * r, axis=-1) + (eta - 1.0) * par * par
        return acc + jnp.sum(per_row * valid_b), None

    total, _ = jax.lax.scan(blk, jnp.float32(0.0), (xb, valid, inv, codes))
    return total


def _prep(x2d, m: int, chunk: int):
    n, d = x2d.shape
    if d % m != 0:
        raise DimensionMismatch(expected=m, found=d)
    norms = jnp.sqrt(jnp.sum(x2d * x2d, axis=-1))
    inv = jnp.where(norms > 0, 1.0 / jnp.maximum(norms, 1e-20), 0.0)
    xb, valid = _blocks(x2d.reshape(n, m, d // m), chunk)
    invb, _ = _blocks(inv, chunk)
    return xb, valid, invb


def pq_encode_anisotropic(
    x, codebooks, eta: float, *, sweeps: int = 2,
    init_codes=None, chunk: int = _DEFAULT_CHUNK,
) -> jnp.ndarray:
    """Encode ``[n, d]`` under the anisotropic loss -> ``[n, m]`` i32 codes.

    Initialized from the plain per-subspace argmin (``init_codes`` overrides;
    the fused Pallas path on TPU), then ``sweeps`` rounds of coordinate
    descent. ``eta = 1`` returns the plain-PQ codes exactly. Zero-norm rows
    fall back to plain L2 (their direction is undefined), matching
    :func:`vq_tpu.ops.kmeans_anisotropic.lloyd_anisotropic`.
    """
    cb = jnp.asarray(codebooks, jnp.float32)
    m, k, s = cb.shape
    x2d, was_1d = as_batch_f32(x)
    if x2d.shape[1] != m * s:
        raise DimensionMismatch(expected=m * s, found=x2d.shape[1])
    eta = float(eta)
    if eta < 1.0:
        raise InvalidParameter("eta", "must be >= 1 (1 = plain PQ)")
    n = x2d.shape[0]
    if init_codes is None:
        init_codes = pq_encode(x2d, cb, "euclidean")
    codes0 = jnp.asarray(init_codes).astype(jnp.int32)
    xb, _valid, inv = _prep(x2d, m, chunk)
    cblk, _ = _blocks(codes0, chunk)
    T = _init_T_jit(xb, inv, cblk, cb)
    codes, _T = _encode_jit(xb, inv, cblk, T, cb, jnp.float32(eta), int(sweeps))
    out = codes.reshape(-1, m)[:n]
    return out[0] if was_1d else out


def pq_refine_anisotropic(
    data, codebooks, *, eta: Optional[float] = None, threshold: float = 0.2,
    iters: int = 5, sweeps: int = 1, ridge: float = 1e-6,
    chunk: int = _DEFAULT_CHUNK,
):
    """Refine trained PQ codebooks under the anisotropic loss.

    Alternates ``sweeps`` coordinate-descent encode sweeps with exact
    per-cluster weighted-least-squares codebook updates for ``iters``
    rounds. Returns ``(codebooks [m,k,s], codes [n,m], loss)``; the loss is
    the summed anisotropic objective and is non-increasing in ``iters``.
    """
    x2d = check_training_matrix(data)
    cb = jnp.asarray(codebooks, jnp.float32)
    m, k, s = cb.shape
    if x2d.shape[1] != m * s:
        raise DimensionMismatch(expected=m * s, found=x2d.shape[1])
    if eta is None:
        eta = anisotropic_eta(threshold, x2d.shape[1])
    eta = float(eta)
    if eta < 1.0:
        raise InvalidParameter("eta", "must be >= 1 (1 = plain PQ)")
    n = x2d.shape[0]
    codes0 = pq_encode(x2d, cb, "euclidean")
    xb, valid, inv = _prep(x2d, m, chunk)
    cblk, _ = _blocks(codes0, chunk)
    T = _init_T_jit(xb, inv, cblk, cb)
    cb, codes, _T = _refine_jit(
        xb, valid, inv, cblk, T, cb, jnp.float32(eta), jnp.float32(ridge),
        int(iters), int(sweeps),
    )
    loss = _loss_jit(xb, valid, inv, codes, cb, jnp.float32(eta))
    return cb, codes.reshape(-1, m)[:n], loss


def pq_train_anisotropic(
    training_data, num_subspaces: int, num_centroids: int,
    max_iters: int = 10, seed: int = 42, *, eta: Optional[float] = None,
    threshold: float = 0.2, refine_iters: int = 5, sweeps: int = 1,
    ridge: float = 1e-6, chunk: int = _DEFAULT_CHUNK,
) -> jnp.ndarray:
    """Train anisotropic PQ codebooks: plain PQ init (fused on TPU), then
    :func:`pq_refine_anisotropic`. Returns ``[m, k, sub_dim]`` f32."""
    cb = pq_train(
        training_data, num_subspaces, num_centroids,
        max_iters=max_iters, seed=seed,
    )
    cb, _codes, _loss = pq_refine_anisotropic(
        training_data, cb, eta=eta, threshold=threshold, iters=refine_iters,
        sweeps=sweeps, ridge=ridge, chunk=chunk,
    )
    return cb


def anisotropic_pq_loss(x, codebooks, codes, eta: float,
                        chunk: int = _DEFAULT_CHUNK) -> float:
    """Summed anisotropic objective of ``codes`` for ``x`` (diagnostic)."""
    cb = jnp.asarray(codebooks, jnp.float32)
    x2d, _ = as_batch_f32(x)
    xb, valid, inv = _prep(x2d, cb.shape[0], chunk)
    cblk, _ = _blocks(jnp.asarray(codes).astype(jnp.int32), chunk)
    return float(_loss_jit(xb, valid, inv, cblk, cb, jnp.float32(float(eta))))


@functools.partial(jax.jit, static_argnames=("topk",))
def _mips_search_jit(tables, code_chunks, nvalid, topk: int):
    Q = tables.shape[0]
    chunk = code_chunks.shape[1]

    def body(carry, inp):
        best_s, best_i = carry
        chunk_codes, cidx = inp
        scores = _adc_lookup_jit(tables, chunk_codes)  # [Q, chunk] dot
        gidx = cidx * chunk + jnp.arange(chunk)
        scores = jnp.where((gidx < nvalid)[None, :], scores, -jnp.inf)
        cat_s = jnp.concatenate([best_s, scores], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(gidx[None, :], (Q, chunk))], axis=1
        )
        top, pos = jax.lax.top_k(cat_s, topk)
        return (top, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (
        jnp.full((Q, topk), -jnp.inf, jnp.float32),
        jnp.full((Q, topk), -1, jnp.int32),
    )
    (best_s, best_i), _ = jax.lax.scan(
        body, init, (code_chunks, jnp.arange(code_chunks.shape[0]))
    )
    return best_i, best_s


@functools.partial(jax.jit, static_argnames=("topk", "interpret"))
def _mips_search_fused_jit(tables, codes, topk: int, interpret=False):
    """MIPS top-k via the VMEM-resident gather+top-k kernel (mode
    ``"dot"``): per-tile best candidates extracted in-kernel, one stable
    ``top_k`` merge — scores and ids exactly match
    :func:`_mips_search_jit` (same f32 table sums, earlier position wins
    score ties in both)."""
    from vq_tpu.ops.pallas_kernels import adc_scan_topk_fused

    codes_t = codes.astype(jnp.uint8).T  # [m, n]
    vals, ids = adc_scan_topk_fused(
        tables, codes_t, topk, mode="dot", interpret=interpret
    )
    top, pos = jax.lax.top_k(-vals, topk)  # vals = -score
    idx = jnp.take_along_axis(ids, pos, axis=1)
    return jnp.where(jnp.isneginf(top), -1, idx), top


def mips_adc_search(queries, codebooks, codes, k: int = 10,
                    chunk: int = 262_144):
    """Top-k maximum-inner-product search over an encoded corpus.

    Per-query dot tables ``[Q, m, k]`` (one einsum), summed per code word
    with one-hot matmuls, scanned blockwise with a running top-k merge —
    the working set is ``[Q, chunk]`` at any corpus size. Returns
    ``(indices [Q, k], scores [Q, k])`` sorted by descending score; rows
    shorter than ``k`` pad with ``-1`` / ``-inf``.
    """
    cb = jnp.asarray(codebooks, jnp.float32)
    m, kk, s = cb.shape
    q2d, _ = as_batch_f32(queries)
    if q2d.shape[1] != m * s:
        raise DimensionMismatch(expected=m * s, found=q2d.shape[1])
    tables = jnp.einsum(
        "qms,mks->qmk", q2d.reshape(-1, m, s), cb,
        preferred_element_type=jnp.float32, precision=_HIGHEST,
    )
    codes = jnp.asarray(codes)
    if codes.ndim == 1:
        codes = codes[None, :]
    n = codes.shape[0]
    from vq_tpu.ops.pallas_kernels import adc_topk_max_block

    if (
        jax.default_backend() == "tpu"
        and kk <= 256
        and 1 <= int(k) <= 128
        # Full kernel VMEM gate (Q + table scratch must fit together).
        and adc_topk_max_block(q2d.shape[0], m, kk, "dot") > 0
        and n > 32_768
    ):
        return _mips_search_fused_jit(tables, codes, int(k))
    codes = codes.astype(jnp.int32)
    chunks, _ = _blocks(codes, chunk)
    return _mips_search_jit(tables, chunks, jnp.int32(n), int(k))


class AnisotropicProductQuantizer(ProductQuantizer):
    """Product quantizer trained and encoded under the anisotropic loss.

    Construction trains plain PQ (fused Pallas trainer on TPU), then
    refines codebooks score-aware; :meth:`encode` runs coordinate descent
    (``eta=1`` makes both identical to :class:`ProductQuantizer`). Use
    :meth:`mips_search` for inner-product retrieval; the inherited L2
    ``decode``/``adc_search`` remain available and operate on the same
    codes.
    """

    def __init__(
        self, training_data=None, num_subspaces: int = None,
        num_centroids: int = None, max_iters: int = 10, seed: int = 42, *,
        eta: Optional[float] = None, threshold: float = 0.2,
        refine_iters: int = 5, sweeps: int = 2, ridge: float = 1e-6,
        codebooks=None, block_rows: Optional[int] = None,
    ):
        if codebooks is not None:
            super().__init__(
                distance="euclidean", codebooks=codebooks,
                block_rows=block_rows,
            )
            if eta is None:
                eta = anisotropic_eta(threshold, self.dim)
        else:
            super().__init__(
                training_data, num_subspaces, num_centroids,
                max_iters=max_iters, distance="euclidean", seed=seed,
                block_rows=block_rows,
            )
            if eta is None:
                eta = anisotropic_eta(threshold, self.dim)
            if float(eta) < 1.0:
                raise InvalidParameter("eta", "must be >= 1 (1 = plain PQ)")
            self._codebooks, _, _ = pq_refine_anisotropic(
                training_data, self._codebooks, eta=float(eta),
                iters=refine_iters, sweeps=1, ridge=ridge,
            )
        eta = float(eta)
        if eta < 1.0:
            raise InvalidParameter("eta", "must be >= 1 (1 = plain PQ)")
        self._eta = eta
        self._sweeps = int(sweeps)

    @property
    def eta(self) -> float:
        return self._eta

    def encode(self, x) -> jnp.ndarray:
        """Anisotropic coordinate-descent encode -> code indices (u8 when
        ``k <= 256``, like the parent)."""
        x2d, was_1d = as_batch_f32(x)
        codes = pq_encode_anisotropic(
            x2d, self._codebooks, self._eta, sweeps=self._sweeps
        )
        if self.num_centroids <= 256:
            codes = codes.astype(jnp.uint8)
        return codes[0] if was_1d else codes

    def mips_search(self, queries, codes, k: int = 10, *,
                    chunk: int = 262_144):
        """Top-k inner-product search over ``codes`` (see
        :func:`mips_adc_search`)."""
        return mips_adc_search(
            queries, self._codebooks, codes, k=k, chunk=chunk
        )

    def __repr__(self) -> str:
        return (
            f"AnisotropicProductQuantizer(m={self.num_subspaces}, "
            f"k={self.num_centroids}, sub_dim={self.sub_dim}, "
            f"eta={self._eta:.3g})"
        )

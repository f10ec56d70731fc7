"""Residual quantization (RQ) — stage-wise additive codebooks.

RQ approximates ``x ≈ Σ_s C_s[code_s]``: stage ``s`` k-means-quantizes the
residual left by stages ``< s``. Unlike PQ's per-subspace split, every
codeword spans the full dimension, which wins at small byte budgets and on
data whose structure doesn't align with coordinate blocks. This codec
family (RQ/LSQ/additive) has no counterpart in the reference library.

Training: sequential Lloyd's per stage on the running residual (stage
``s`` uses PRNG ``fold_in(seed, s)``). Encoding: greedy nearest-centroid
per stage — each stage is one fused distance+argmin over ``[k, d]``
centroids, the same kernel shape as k-means assignment. Decoding: sum of
``S`` gathers.

LSQ-style joint optimization (:func:`rq_refine_joint`): alternate
beam-search encoding with the *exact* least-squares codebook update for
fixed codes — for each output dimension independently,
``X ≈ B W`` where ``B [n, S*k]`` is the concatenated stage one-hot matrix
and ``W [S*k, d]`` the stacked codebooks, so the optimal update solves the
normal equations ``(BᵀB + λI) W = BᵀX``. Both Gram accumulation (one-hot
matmuls over data tiles, MXU) and the SPD solve (Cholesky on a
``[S·k, S·k]`` matrix) run on device. The codebook step is globally
optimal per iteration, unlike stage-wise k-means which ignores
inter-stage interactions (Martinez et al., "Solving multi-codebook
quantization in the GPU", and the LSQ/LSQ++ line of work).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vq_tpu.errors import DimensionMismatch, InvalidParameter
from vq_tpu.models.base import Quantizer, as_batch_f32, check_training_matrix
from vq_tpu.ops.kmeans import assign, lloyd

__all__ = [
    "ResidualQuantizer",
    "rq_train",
    "rq_encode",
    "rq_decode",
    "rq_refine_joint",
]


from vq_tpu.ops.pick import pick_rows as _pick_rows


def rq_train(
    training_data,
    num_stages: int,
    num_centroids: int,
    max_iters: int = 10,
    seed: int = 42,
) -> jnp.ndarray:
    """Train stage codebooks; returns ``[S, k, d]`` f32."""
    data = check_training_matrix(training_data)
    S, k = int(num_stages), int(num_centroids)
    if S <= 0:
        raise InvalidParameter("num_stages", "must be greater than 0")
    residual = data
    codebooks = []
    for s in range(S):
        res = lloyd(
            residual, k, max_iters=max_iters,
            key=jax.random.fold_in(jax.random.PRNGKey(int(seed)), s),
        )
        codebooks.append(res.centroids)
        residual = residual - _pick_rows(res.centroids, res.assignments)
    return jnp.stack(codebooks)  # [S, k, d]


@jax.jit
def _rq_encode_jit(x: jnp.ndarray, cbs: jnp.ndarray) -> jnp.ndarray:
    """Greedy stage-wise encode: [n, d] x [S, k, d] -> [n, S] int32."""

    def stage(residual, cb):
        cc = jnp.sum(cb * cb, axis=-1)
        xc = jax.lax.dot_general(
            residual, cb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        codes = jnp.argmin(cc[None, :] - 2.0 * xc, axis=-1).astype(jnp.int32)
        return residual - _pick_rows(cb, codes), codes

    _, codes = jax.lax.scan(stage, x, cbs)
    return codes.T  # [n, S]


@functools.partial(jax.jit, static_argnames=("beam", "block_rows"))
def _rq_encode_beam_jit(
    x: jnp.ndarray, cbs: jnp.ndarray, beam: int, block_rows: int
) -> jnp.ndarray:
    """Beam-search encode: track the ``beam`` best additive prefixes.

    Greedy RQ is suboptimal because stages interact; with beam width B the
    cumulative objective after stage s is exactly the candidate residual's
    squared norm, so selection is a top-B over ``[B*k]`` expanded scores per
    vector. B=1 reduces to greedy. Data is tiled over ``block_rows`` so the
    ``[tile, B, d]`` residual tensor stays modest.
    """
    n, d = x.shape
    S, k, _ = cbs.shape
    pad = (-n) % block_rows
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    tiles = xp.reshape(-1, block_rows, d)
    cc = jnp.sum(cbs * cbs, axis=-1)  # [S, k]

    def encode_tile(tile):
        # Stage 0: plain nearest-B.
        xc = jax.lax.dot_general(
            tile, cbs[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [T, k]
        xx = jnp.sum(tile * tile, axis=-1, keepdims=True)
        scores0 = xx + cc[0][None, :] - 2.0 * xc
        neg, idx0 = jax.lax.top_k(-scores0, beam)  # [T, B]
        # Fixed-shape carry: codes preallocated [T, B, S], written per stage.
        codes = jnp.zeros((tile.shape[0], beam, S), jnp.int32)
        codes = codes.at[:, :, 0].set(idx0)
        residuals = tile[:, None, :] - jnp.take(cbs[0], idx0, axis=0)
        costs = -neg  # [T, B] == ||residual||^2 (+ rounding)

        def stage(carry, inp):
            codes, residuals, _costs = carry
            cb_s, cc_s, s_idx = inp  # [k, d], [k], []
            rc = jnp.einsum(
                "tbd,kd->tbk", residuals, cb_s,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            rr = jnp.sum(residuals * residuals, axis=-1)  # [T, B]
            scores = rr[:, :, None] + cc_s[None, None, :] - 2.0 * rc
            flat = scores.reshape(scores.shape[0], beam * k)
            neg, pick = jax.lax.top_k(-flat, beam)  # [T, B]
            parent = pick // k
            code = pick % k
            new_codes = jnp.take_along_axis(
                codes, parent[:, :, None], axis=1
            )
            new_codes = jax.lax.dynamic_update_index_in_dim(
                new_codes, code, s_idx, axis=2
            )
            new_res = (
                jnp.take_along_axis(residuals, parent[:, :, None], axis=1)
                - jnp.take(cb_s, code, axis=0)
            )
            return (new_codes, new_res, -neg), None

        (codes, residuals, costs), _ = jax.lax.scan(
            stage,
            (codes, residuals, costs),
            (cbs[1:], cc[1:], jnp.arange(1, S)),
        )
        best = jnp.argmin(costs, axis=-1)  # [T]
        return jnp.take_along_axis(
            codes, best[:, None, None], axis=1
        )[:, 0, :].astype(jnp.int32)

    out = jax.lax.map(encode_tile, tiles)
    return out.reshape(-1, S)[:n]


@functools.partial(jax.jit, static_argnames=("k", "block_rows"))
def _rq_solve_codebooks_jit(
    x: jnp.ndarray, codes: jnp.ndarray, k: int, block_rows: int,
    ridge: float = 1e-5,
):
    """Exact least-squares codebook update for fixed codes.

    Accumulates the normal equations over data tiles — ``G = BᵀB``
    (``[S*k, S*k]`` stage-code co-occurrence Gram) and ``H = BᵀX`` — where
    the per-tile one-hot block ``[T, S, k] -> [T, S*k]`` reshape lands each
    stage in its own column block, so both accumulations are plain MXU
    matmuls. Solves ``(G + λ tr(G)/Sk · I) W = H`` by Cholesky (λ keeps
    never-used codewords harmless) and returns ``[S, k, d]`` codebooks.
    """
    n, d = x.shape
    S = codes.shape[1]
    sk = S * k
    pad = (-n) % block_rows
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    # Padded rows get code k (one_hot -> all-zero row): they contribute
    # nothing to G or H.
    cp = jnp.pad(codes, ((0, pad), (0, 0)), constant_values=k)
    x_tiles = xp.reshape(-1, block_rows, d)
    c_tiles = cp.reshape(-1, block_rows, S)

    def body(carry, inp):
        G, H = carry
        xt, ct = inp
        oh = jax.nn.one_hot(ct, k, dtype=jnp.float32).reshape(
            xt.shape[0], sk
        )  # [T, S*k]
        G = G + jax.lax.dot_general(
            oh, oh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        H = H + jax.lax.dot_general(
            oh, xt, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return (G, H), None

    init = (jnp.zeros((sk, sk), jnp.float32), jnp.zeros((sk, d), jnp.float32))
    (G, H), _ = jax.lax.scan(body, init, (x_tiles, c_tiles))
    lam = ridge * jnp.trace(G) / sk + 1e-20
    W = jax.scipy.linalg.solve(
        G + lam * jnp.eye(sk, dtype=jnp.float32), H, assume_a="pos"
    )
    return W.reshape(S, k, d)


def rq_refine_joint(
    training_data,
    codebooks,
    *,
    iters: int = 3,
    beam: int = 4,
    block_rows: int = 1024,
    ridge: float = 1e-5,
) -> jnp.ndarray:
    """LSQ-style alternating refinement of RQ codebooks.

    Each iteration: (1) beam-search encode with the current codebooks,
    (2) replace ALL stage codebooks with the globally optimal
    least-squares solution for those codes (:func:`_rq_solve_codebooks_jit`).
    The codebook step never increases reconstruction MSE for fixed codes;
    in practice 2-4 iterations recover most of the gap between stage-wise
    RQ and joint additive quantization.
    """
    data = check_training_matrix(training_data)
    cbs = jnp.asarray(codebooks, jnp.float32)
    S, k, d = cbs.shape
    if data.shape[1] != d:
        raise DimensionMismatch(expected=d, found=data.shape[1])
    block = min(int(block_rows), data.shape[0])
    for _ in range(int(iters)):
        codes = rq_encode(data, cbs, beam=beam)
        cbs = _rq_solve_codebooks_jit(
            data, codes.astype(jnp.int32), k, block, float(ridge)
        )
    return cbs


@functools.partial(jax.jit, static_argnames=("use_onehot",))
def _rq_decode_jit(
    codes: jnp.ndarray, cbs: jnp.ndarray, use_onehot: bool = False
) -> jnp.ndarray:
    def body(acc, inp):
        cb, c = inp
        if use_onehot:
            # TPU: a take with millions of indices into a k<=256-row
            # table lowers to a ~15 ms select ladder PER STAGE; the
            # one-hot HIGHEST matmul gathers bit-exactly (lossless
            # bf16x6 split + exact 1.0/0.0 products) at ~10x — same
            # finding as PQ decode (models/pq.py::_pq_decode_jit).
            cc = jnp.clip(c, 0, cb.shape[0] - 1)  # take's clip mode
            picked = jax.lax.dot_general(
                jax.nn.one_hot(cc, cb.shape[0], dtype=jnp.float32), cb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            picked = jnp.take(cb, c, axis=0)
        return acc + picked, None

    init = jnp.zeros((codes.shape[0], cbs.shape[2]), jnp.float32)
    out, _ = jax.lax.scan(body, init, (cbs, codes.T))
    return out


def rq_encode(x, codebooks, beam: int = 1, block_rows: int = 4096) -> jnp.ndarray:
    """Encode; ``beam > 1`` enables beam search (lower MSE, B*k work/stage)."""
    cbs = jnp.asarray(codebooks, jnp.float32)
    x2d, _ = as_batch_f32(x)
    if x2d.shape[1] != cbs.shape[2]:
        raise DimensionMismatch(expected=cbs.shape[2], found=x2d.shape[1])
    if int(beam) > 1:
        return _rq_encode_beam_jit(
            x2d, cbs, int(beam), min(int(block_rows), x2d.shape[0])
        )
    return _rq_encode_jit(x2d, cbs)


def rq_decode(codes, codebooks) -> jnp.ndarray:
    cbs = jnp.asarray(codebooks, jnp.float32)
    codes = jnp.asarray(codes)
    if codes.ndim == 1:
        codes = codes[None, :]
    if codes.shape[1] != cbs.shape[0]:
        raise DimensionMismatch(expected=cbs.shape[0], found=codes.shape[1])
    return _rq_decode_jit(
        codes.astype(jnp.int32), cbs,
        use_onehot=(
            jax.default_backend() == "tpu" and cbs.shape[1] <= 4096
        ),
    )


class ResidualQuantizer(Quantizer):
    """Additive residual quantizer: ``S`` stages × ``k`` full-d centroids.

    ``ResidualQuantizer(training_data, num_stages, num_centroids, ...)``
    trains; pass ``codebooks=[S, k, d]`` to restore. ``joint_iters > 0``
    follows the stage-wise init with that many LSQ-style alternating
    refinement rounds (:func:`rq_refine_joint`) — lower MSE at the cost of
    ``joint_iters`` beam encodes + least-squares solves.
    """

    def __init__(
        self,
        training_data=None,
        num_stages: Optional[int] = None,
        num_centroids: Optional[int] = None,
        max_iters: int = 10,
        seed: int = 42,
        *,
        codebooks=None,
        joint_iters: int = 0,
        beam: int = 4,
    ):
        if codebooks is not None:
            cbs = jnp.asarray(codebooks, jnp.float32)
            if cbs.ndim != 3:
                raise InvalidParameter(
                    "codebooks", f"must be [S, k, d], got {cbs.ndim}-D"
                )
            self._cbs = cbs
        else:
            if training_data is None or num_stages is None or (
                num_centroids is None
            ):
                raise InvalidParameter(
                    "training_data",
                    "required (with num_stages/num_centroids) unless "
                    "codebooks are given",
                )
            self._cbs = rq_train(
                training_data, num_stages, num_centroids,
                max_iters=max_iters, seed=seed,
            )
            if int(joint_iters) > 0:
                self._cbs = rq_refine_joint(
                    training_data, self._cbs,
                    iters=int(joint_iters), beam=int(beam),
                )

    @property
    def codebooks(self) -> jnp.ndarray:
        return self._cbs

    @property
    def num_stages(self) -> int:
        return self._cbs.shape[0]

    @property
    def num_centroids(self) -> int:
        return self._cbs.shape[1]

    @property
    def dim(self) -> int:
        return self._cbs.shape[2]

    def encode(self, x, beam: int = 1) -> jnp.ndarray:
        """``beam > 1`` uses beam-search over stage combinations (lower MSE
        at B*k scoring cost per stage; greedy when 1)."""
        x2d, was_1d = as_batch_f32(x)
        codes = rq_encode(x2d, self._cbs, beam=beam)
        if self.num_centroids <= 256:
            codes = codes.astype(jnp.uint8)
        return codes[0] if was_1d else codes

    def decode(self, codes) -> jnp.ndarray:
        codes = jnp.asarray(codes)
        was_1d = codes.ndim == 1
        out = rq_decode(codes, self._cbs)
        return out[0] if was_1d else out

    def quantize(self, x) -> jnp.ndarray:
        x2d, was_1d = as_batch_f32(x)
        if x2d.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x2d.shape[1])
        recon = self.decode(self.encode(x2d)).astype(jnp.float16)
        return recon[0] if was_1d else recon

    def dequantize(self, quantized) -> jnp.ndarray:
        q = jnp.asarray(quantized)
        d = q.shape[-1] if q.ndim else 0
        if d != self.dim:
            raise DimensionMismatch(expected=self.dim, found=d)
        return q.astype(jnp.float32)

    def __repr__(self) -> str:
        return (
            f"ResidualQuantizer(stages={self.num_stages}, "
            f"k={self.num_centroids}, dim={self.dim})"
        )

"""Round-4 calibration: re-derive every roofline number with the
scan-chained methodology (VERDICT r3 #1).

Rounds 1-2 calibrated the chip with per-dispatch timings that round 3
proved carry a ~29 ms tunnel RPC each (dispatches do NOT pipeline, so
rep-count differencing cannot cancel it). This harness re-measures the
chip with T iterations chained inside ONE jit via ``lax.scan`` (inputs
perturbed per step so nothing CSEs/hoists) and subtracts a measured
null-dispatch RPC estimate from the per-chain time, leaving pure device
time:

    per_chain = RPC + T * op_device        (chain dispatches serialize)
    op_device = (per_chain - RPC_null) / T

Variants: dense 8192^2 matmul at HIGHEST f32 and DEFAULT bf16 (the MXU
calibration), the k-means fused assign+accumulate iteration, the fused
PQ encode, the XLA encode, a scores-only (matmul-only, no-argmin)
encode, and the m-packed block-diagonal encode reformulation
([n, d] x [d, m*k] dense + per-subspace argmin) the round-2 analysis
argued could not help — now tested against honest device numbers.

One JSON line per variant; run on TPU (serialize with other tunnel
users).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_ms(make_step, operands, T: int, rpc_s: float,
             reps=(2, 6)) -> float:
    """Device ms per op: scan-chain T steps in one jit, difference chain
    rep counts, subtract the measured per-dispatch RPC.

    ``operands`` MUST carry every large array ``make_step`` touches —
    closure capture bakes them into the program as CONSTANTS, which
    ships hundreds of MB with the remote compile request through the
    ~MB/s tunnel (observed: the 8192² calibration "hung" >12 min
    uploading its two 256 MB constants)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(*ops):
        def step(_, t):
            return None, make_step(t, *ops)

        _, outs = jax.lax.scan(step, None, jnp.arange(T, dtype=jnp.int32))
        return jnp.sum(outs)

    float(chain(*operands))  # compile + warm

    def run(r):
        t0 = time.perf_counter()
        vals = [chain(*operands) for _ in range(r)]
        for v in vals:
            float(v)
        return time.perf_counter() - t0

    run(1)  # settle
    r0, r1 = reps
    t0 = min(run(r0) for _ in range(2))
    t1 = min(run(r1) for _ in range(2))
    per_chain = max((t1 - t0) / (r1 - r0), 1e-9)
    return max(per_chain - rpc_s, 1e-9) / T * 1e3


def measure_rpc() -> float:
    """Per-dispatch RPC floor: a do-nothing-sized jitted op, differenced."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x * 1.000001))
    x = jnp.ones((8, 8), jnp.float32)
    float(f(x))

    def run(r):
        t0 = time.perf_counter()
        vals = [f(x) for _ in range(r)]
        for v in vals:
            float(v)
        return time.perf_counter() - t0

    run(2)
    t0 = min(run(3) for _ in range(2))
    t1 = min(run(13) for _ in range(2))
    return max((t1 - t0) / 10.0, 1e-9)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--t", type=int, default=8)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--only", type=str, default="")
    p.add_argument("--output", type=str, default="-")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from benchmarks._artifact import git_hash

    HI = jax.lax.Precision.HIGHEST
    git = git_hash()
    out = sys.stdout if args.output == "-" else open(args.output, "a")

    def emit(**fields):
        out.write(json.dumps({**fields, "git": git}) + "\n")
        out.flush()

    print("backend:", jax.default_backend(), flush=True)
    rpc = measure_rpc()
    emit(op="null_dispatch_rpc", ms=round(rpc * 1e3, 3),
         note="per-dispatch tunnel RPC estimate, subtracted below")

    T = args.t
    N, DIM, M, K = args.n, 128, 8, 256
    SUB = DIM // M
    kx, kc = jax.random.split(jax.random.PRNGKey(66))
    x = jax.random.uniform(kx, (N, DIM), jnp.float32)
    cb = jax.random.uniform(kc, (M, K, SUB), jnp.float32)
    a8 = jax.random.uniform(kx, (8192, 8192), jnp.float32)
    b8 = jax.random.uniform(kc, (8192, 8192), jnp.float32)
    a8h = a8.astype(jnp.bfloat16)
    b8h = b8.astype(jnp.bfloat16)

    dense_flop = 2 * 8192**3

    variants = {}

    def dense_f32(t, a8, b8):
        c = jax.lax.dot_general(
            a8 + 1e-6 * jnp.float32(t), b8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        # Consume EVERY output element NON-LINEARLY: a sliced consumer
        # lets XLA rewrite slice-of-dot into dot-of-slices (observed:
        # 610 "TFLOP/s" from a [2, 2] readback), and a plain sum(A@B)
        # decomposes into colsum(A)·rowsum(B) (observed: 540 "TFLOP/s"
        # bf16 — past chip peak). sum(c²) admits neither rewrite.
        return jnp.sum(c * c)

    variants["dense8192_f32_highest"] = (dense_f32, (a8, b8), dense_flop)

    def dense_bf16(t, a8h, b8h):
        c = jax.lax.dot_general(
            a8h + jnp.bfloat16(t), b8h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(c * c)  # non-linear full consumption (see dense_f32)

    variants["dense8192_bf16_default"] = (dense_bf16, (a8h, b8h), dense_flop)

    # k-means iteration: the fused assign+accumulate at 1M x 128, k=256.
    from vq_tpu.ops.kmeans import _accumulate_dispatch

    cents = jax.random.uniform(kc, (K, DIM), jnp.float32)

    def kmeans_iter(t, x, cents):
        sums, counts, inertia = _accumulate_dispatch(
            x + 1e-6 * jnp.float32(t), cents, 1024,
            jax.default_backend() == "tpu",
        )
        return jnp.sum(sums[:2, :2]) + inertia

    variants["kmeans_assign_accumulate_1Mx128_k256"] = (
        kmeans_iter, (x, cents), 2 * N * DIM * K + 2 * N * DIM * K
    )  # assign matmul + one-hot accumulate matmul

    # Fused PQ encode (the headline op).
    from vq_tpu.models.pq import _pq_encode_jit
    from vq_tpu.ops.distance import Metric
    from vq_tpu.ops.pallas_kernels import pq_encode_fused

    def enc_fused(t, x, cb):
        codes = pq_encode_fused(x + 1e-6 * jnp.float32(t), cb,
                                block_rows=768)
        return jnp.sum(codes[:8, :])

    variants["pq_encode_fused_1Mx128_8x256"] = (
        enc_fused, (x, cb), 2 * N * DIM * K
    )  # useful FLOPs: n * m * (2*s*k) = 2*n*d*k

    def enc_xla(t, x, cb):
        codes = _pq_encode_jit(
            x + 1e-6 * jnp.float32(t), cb, Metric.EUCLIDEAN, 8192
        )
        return jnp.sum(codes[:8, :])

    variants["pq_encode_xla_1Mx128_8x256"] = (
        enc_xla, (x, cb), 2 * N * DIM * K
    )

    # Matmul-only: the same per-subspace contractions, min-reduce instead
    # of argmin (cheapest possible epilogue) — isolates the MXU cost.
    def enc_scores_only(t, x, cb):
        xs = (x + 1e-6 * jnp.float32(t)).reshape(N, M, SUB)
        pad = (-N) % 8192
        tiles = jnp.pad(xs, ((0, pad), (0, 0), (0, 0))).reshape(
            -1, 8192, M, SUB
        )
        cc = jnp.sum(cb * cb, axis=-1)

        def one(tile):
            xc = jnp.einsum(
                "nms,mks->nmk", tile, cb,
                preferred_element_type=jnp.float32, precision=HI,
            )
            return jnp.min(cc[None] - 2.0 * xc, axis=-1)

        return jnp.sum(jax.lax.map(one, tiles))

    variants["pq_scores_only_xla_1Mx128_8x256"] = (
        enc_scores_only, (x, cb), 2 * N * DIM * K
    )

    # m-packed block-diagonal reformulation: ONE dense [n, d] x [d, m*k]
    # matmul (contraction fully filled at d=128) + per-subspace argmin.
    # 8x the useful FLOPs (the off-diagonal blocks multiply zeros) but a
    # full-depth contraction — the round-2 analysis said identical pass
    # count; measured here.
    W = np.zeros((DIM, M * K), np.float32)
    cb_h = np.asarray(cb)
    for i in range(M):
        W[i * SUB:(i + 1) * SUB, i * K:(i + 1) * K] = (
            -2.0 * cb_h[i].T
        )
    Wd = jnp.asarray(W)
    ccd = jnp.asarray(
        np.concatenate([np.sum(cb_h[i] ** 2, -1) for i in range(M)])
    )

    def enc_mpacked(t, x, Wd, ccd):
        pad = (-N) % 8192
        tiles = jnp.pad(
            x + 1e-6 * jnp.float32(t), ((0, pad), (0, 0))
        ).reshape(-1, 8192, DIM)

        def one(tile):
            scores = jax.lax.dot_general(
                tile, Wd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI,
            ) + ccd[None, :]
            return jnp.argmin(
                scores.reshape(-1, M, K), axis=-1
            ).astype(jnp.int32)

        codes = jax.lax.map(one, tiles)
        return jnp.sum(codes[0, :8, :])

    variants["pq_encode_mpacked_dense_1Mx128_8x256"] = (
        enc_mpacked, (x, Wd, ccd), 2 * N * DIM * (M * K)
    )  # dense FLOPs (8x useful)

    only = set(args.only.split(",")) if args.only else None
    for name, (fn, ops, flops) in variants.items():
        if only and name not in only:
            continue
        try:
            ms = chain_ms(fn, ops, T, rpc)
            emit(
                op=name, ms=round(ms, 3),
                tflops=round(flops / (ms / 1e3) / 1e12, 2),
                chain_T=T, rpc_subtracted_ms=round(rpc * 1e3, 3),
            )
        except Exception as e:  # noqa: BLE001 — keep measuring the rest
            emit(op=name, error=f"{type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

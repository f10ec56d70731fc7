"""m-packed PQ encode kernel experiment (VERDICT r3 #1's named retest).

The shipped fused encode does m separate [tile, s] x [s, k] contractions
per tile — at s=16 the MXU contraction depth fills 16/128, so every
pass wastes 7/8 of its MAC slots. Round 2 argued a block-diagonal
[tile, d] x [d, m*k] reformulation "has the identical pass count, so it
cannot help" — but that counted passes, not pipeline fill: ONE
full-depth [tile, 128] x [128, 2048] matmul runs the same total MACs
with zero contraction underfill and one pipeline drain instead of m.
The round-4 recalibration (benchmarks/roofline_chain.py: dense f32
HIGHEST = 34.5 TF/s, the fused encode = 17.0 ms at 1M x 128 8x256 of
which ~12 ms is matmul) predicts the m-packed kernel at ~6 ms matmul +
epilogue.

The XLA m-packed variant measured 21 ms because it round-trips the
[1M, 2048] f32 scores matrix through HBM (16 GB of traffic); this
kernel keeps each tile's scores in VMEM — same trick as the shipped
per-subspace kernel, different matmul shape.

Also measures a DEFAULT-precision (single-pass bf16) variant: the same
kernel at ~512 TF/s dense — the opt-in fast mode whose argmin flips are
characterized in docs/performance.md's quality table.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vq_tpu.ops.pallas_kernels import _int_argmin, _round_up


def _mpacked_kernel(x_ref, w_ref, cc_ref, codes_ref, *, m, k, precision):
    """One row tile: scores = x @ W + cc in VMEM, per-subspace argmin."""
    scores = jax.lax.dot_general(
        x_ref[:, :], w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + cc_ref[0, :][None, :]  # [tile, m*k]
    tn = x_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1)
    for i in range(m):
        s_i = scores[:, i * k:(i + 1) * k]
        _, idx = _int_argmin(s_i, col, "int2")
        codes_ref[:, i] = idx


@functools.partial(
    jax.jit, static_argnames=("block_rows", "precision_name", "interpret")
)
def mpacked_encode(x, w, cc, block_rows: int, precision_name: str,
                   interpret: bool = False):
    n, d = x.shape
    mk = w.shape[1]
    precision = {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[precision_name]
    k = 256
    m = mk // k
    n_pad = _round_up(n, block_rows)
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    codes = pl.pallas_call(
        functools.partial(
            _mpacked_kernel, m=m, k=k, precision=precision
        ),
        grid=(n_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, mk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m), jnp.int32),
        interpret=interpret,
    )(xp, w, cc)
    return codes[:n]


def build_w(cb):
    """Block-diagonal [-2 c^T] plus the ||c||^2 bias row."""
    m, k, s = cb.shape
    d = m * s
    W = np.zeros((d, m * k), np.float32)
    for i in range(m):
        W[i * s:(i + 1) * s, i * k:(i + 1) * k] = -2.0 * cb[i].T
    cc = np.concatenate([np.sum(cb[i] ** 2, -1) for i in range(m)])
    return W, cc[None, :]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--t", type=int, default=8)
    p.add_argument("--block", type=int, default=512)
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--decompose", action="store_true",
                   help="stage decomposition of the XLA bf16 fast path "
                   "(VERDICT r4 #4): matmul-only vs +argmin vs full "
                   "encode, across tile sizes")
    p.add_argument("--output", type=str, default="-")
    args = p.parse_args(argv)

    from benchmarks._artifact import git_hash

    from vq_tpu.ops.pallas_kernels import pq_encode_fused

    git = git_hash()
    out = sys.stdout if args.output == "-" else open(args.output, "a")

    def emit(**fields):
        out.write(json.dumps({**fields, "git": git}) + "\n")
        out.flush()

    N, DIM, M, K = args.n, 128, 8, 256
    kx, kc = jax.random.split(jax.random.PRNGKey(66))
    x = jax.random.uniform(kx, (N, DIM), jnp.float32)
    cb = jax.random.uniform(kc, (M, K, DIM // M), jnp.float32)
    W, cc = build_w(np.asarray(cb))
    Wd, ccd = jnp.asarray(W), jnp.asarray(cc)
    interp = bool(args.interpret)

    # Parity first: exact codes vs the shipped kernel (HIGHEST).
    ref = np.asarray(pq_encode_fused(x[:100_000], cb, block_rows=768,
                                     interpret=interp))
    got = np.asarray(mpacked_encode(x[:100_000], Wd, ccd, args.block,
                                    "highest", interpret=interp))
    match_hi = float((ref == got).mean())
    emit(op="mpacked_parity_highest", code_match=match_hi, n=100_000)
    got_d = np.asarray(mpacked_encode(x[:100_000], Wd, ccd, args.block,
                                      "default", interpret=interp))
    emit(op="mpacked_parity_default",
         code_match=float((ref == got_d).mean()), n=100_000)
    if interp:
        return 0

    rpc = 0.0293
    T = args.t

    def chain_ms(fn, ops):
        @jax.jit
        def chain(*ops_):
            def step(carry, t):
                out = fn(t + 0 * carry, *ops_)
                return out, out
            s, _ = jax.lax.scan(
                step, jnp.int32(0), jnp.arange(T, dtype=jnp.int32)
            )
            return s

        float(chain(*ops))

        def run(r):
            t0 = time.perf_counter()
            vs = [chain(*ops) for _ in range(r)]
            for v in vs:
                float(v)
            return time.perf_counter() - t0

        run(1)
        t1 = min(run(2) for _ in range(2))
        t2 = min(run(6) for _ in range(2))
        return max((t2 - t1) / 4 - rpc, 1e-9) / T * 1e3

    def enc_ship(t, x, cb):
        codes = pq_encode_fused(x + 1e-6 * jnp.float32(t), cb,
                                block_rows=768)
        return jnp.sum(codes[:8, :])

    def enc_mp_hi(t, x, Wd, ccd):
        codes = mpacked_encode(x + 1e-6 * jnp.float32(t), Wd, ccd,
                               args.block, "highest")
        return jnp.sum(codes[:8, :])

    def enc_mp_def(t, x, Wd, ccd):
        codes = mpacked_encode(x + 1e-6 * jnp.float32(t), Wd, ccd,
                               args.block, "default")
        return jnp.sum(codes[:8, :])

    # bf16-RESIDENT operands: no in-kernel conversion — the corpus is
    # stored bf16 (the framework's half-resident path) and W casts once
    # outside. Single-pass MXU rate applies.
    xh = x.astype(jnp.bfloat16)
    Wh = Wd.astype(jnp.bfloat16)

    def enc_mp_bf16res(t, xh, Wh, ccd):
        codes = mpacked_encode(xh + jnp.bfloat16(1e-3) * t.astype(jnp.bfloat16),
                               Wh, ccd, args.block, "default")
        return jnp.sum(codes[:8, :])

    if args.decompose:
        # --- Stage decomposition of the XLA m-packed bf16 fast path ---
        # (the shipped pq_encode(precision="default")): locate the gap
        # between its ~6.25 ms and the ~1.0-1.3 ms single-pass bf16
        # matmul bound. Consumers are NON-linear (sum(s*s)) so XLA
        # cannot rewrite the matmul away (round-4 measurement traps).
        from vq_tpu.models.pq import _pq_encode_mpacked_jit

        xh = x.astype(jnp.bfloat16)
        Wh = Wd.astype(jnp.bfloat16)

        for tile in (512, 1024, 4096, 16384):
            n_pad = -(-N // tile) * tile
            n_tiles = n_pad // tile
            xh_p = jnp.pad(xh, ((0, n_pad - N), (0, 0)))

            @functools.partial(jax.jit, static_argnames=())
            def mm_only(t, xh, Wh, _tile=tile, _nt=n_tiles):
                tiles = (xh + t.astype(jnp.bfloat16) * jnp.bfloat16(0)
                         ).reshape(_nt, _tile, DIM)

                def one(tl):
                    sc = jax.lax.dot_general(
                        tl, Wh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return jnp.sum(sc * sc)

                return jnp.sum(jax.lax.map(one, tiles)).astype(jnp.int32)

            @functools.partial(jax.jit, static_argnames=())
            def mm_argmin(t, xh, Wh, ccd, _tile=tile, _nt=n_tiles):
                tiles = (xh + t.astype(jnp.bfloat16) * jnp.bfloat16(0)
                         ).reshape(_nt, _tile, DIM)

                def one(tl):
                    sc = jax.lax.dot_general(
                        tl, Wh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + ccd[0][None, :]
                    return jnp.sum(jnp.argmin(
                        sc.reshape(_tile, M, K), axis=-1
                    ).astype(jnp.int32)[:8])

                return jnp.sum(jax.lax.map(one, tiles))

            emit(op="decompose_matmul_only", tile=tile,
                 ms=round(chain_ms(mm_only, (xh_p, Wh)), 3))
            emit(op="decompose_matmul_argmin", tile=tile,
                 ms=round(chain_ms(mm_argmin, (xh_p, Wh, ccd)), 3))

        # Full shipped fast path (includes the per-tile f32->bf16 cast)
        # across tiles. Consumer is the FULL code sum — a sliced
        # consumer would let XLA skip the remainder tile. `impl` tags
        # the round-5 rework (scan + 2D-sliced int1 epilogue + in-body
        # cast); older rows at the same op name measured the
        # lax.map + 3D-reshape argmin form.
        for tile in (4096, 8192, 16384):
            def enc_full(t, x, cb, _tile=tile):
                codes = _pq_encode_mpacked_jit(
                    x + 1e-6 * jnp.float32(t), cb,
                    jax.lax.Precision.DEFAULT, tile=_tile,
                )
                return jnp.sum(codes)

            emit(op="decompose_full_fast_encode", tile=tile,
                 impl="scan_sliced_int1",
                 ms=round(chain_ms(enc_full, (x, cb)), 3))

        # HIGH (bf16x3) regression row at the new default tile — the
        # round-5 restructure (map->scan, bulk+remainder) must not
        # regress the exact-argmin modes.
        def enc_high(t, x, cb):
            codes = _pq_encode_mpacked_jit(
                x + 1e-6 * jnp.float32(t), cb,
                jax.lax.Precision.HIGH,
            )
            return jnp.sum(codes)

        emit(op="decompose_full_high", tile=8192,
             impl="scan_sliced_int1",
             ms=round(chain_ms(enc_high, (x, cb)), 3))

        # bf16-RESIDENT input (cast is a no-op): isolates the f32 read.
        def enc_full_res(t, xh, cb):
            codes = _pq_encode_mpacked_jit(
                xh + t.astype(jnp.bfloat16) * jnp.bfloat16(1e-3), cb,
                jax.lax.Precision.DEFAULT,
            )
            return jnp.sum(codes)

        emit(op="decompose_full_bf16_resident", tile=8192,
             impl="scan_sliced_int1",
             ms=round(chain_ms(enc_full_res, (xh, cb)), 3))
        return 0

    emit(op="encode_shipped_fused", ms=round(chain_ms(enc_ship, (x, cb)), 3))
    emit(op="encode_mpacked_highest",
         ms=round(chain_ms(enc_mp_hi, (x, Wd, ccd)), 3),
         block=args.block, code_match_vs_shipped=match_hi)
    emit(op="encode_mpacked_default",
         ms=round(chain_ms(enc_mp_def, (x, Wd, ccd)), 3),
         block=args.block)
    got_h = np.asarray(mpacked_encode(xh[:100_000], Wh, ccd, args.block,
                                      "default"))
    emit(op="encode_mpacked_bf16resident",
         ms=round(chain_ms(enc_mp_bf16res, (xh, Wh, ccd)), 3),
         block=args.block,
         code_match_vs_shipped=float((ref == got_h).mean()))
    return 0


if __name__ == "__main__":
    sys.exit(main())

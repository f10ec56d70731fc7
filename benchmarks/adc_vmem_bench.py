"""Flat ADC scan kernel experiments (round-3 VERDICT #4 / perf backlog #3).

The flat `PQIndex` ADC lookup is bound by `[Q, n]` accumulator HBM
round-trips in the XLA scan (41 ms at Q=128, n=1M, 8x256), and the round-1
fused kernel lost to it (48 ms) — hypothesis: its one-hot is built `[tn, k]`
and contracted on dim 1 of both operands, forcing a Mosaic transpose
relayout per subspace per tile. Variants measured here:

  xla     — the shipped `_adc_lookup_jit` scan (baseline)
  old     — the round-1 `adc_lookup_fused` ([tn, k] one-hot)
  kt      — one-hot built `[k, tn]` (row-iota == codes), standard matmul
            orientation, codes DMA'd at stored u8 width, transposed [m, n]
  gather  — no one-hot at all: per-subspace VPU `take_along_axis` lane
            gather of the table row (k=256 split into two 128-lane halves
            + select), accumulator VMEM-resident across all m

Usage: python benchmarks/adc_vmem_bench.py [--n 1000000] [--block 2048]
Prints one JSON line per variant.

FINDINGS (round 3, single-call timings include the ~29 ms per-dispatch
tunnel RPC — the `floor` variant, which does almost nothing, measures
~29 ms too; chain searches in one jit for device time, see
/tmp-style scan16 harness results recorded in docs/performance.md):

  xla 41-45 ms  -> ~12-16 ms device (MXU-bound: one-hot wastes 256x)
  kt  47.8 ms   -> ~19 ms device (= the 17.6 ms HIGHEST-f32 MXU bound)
  gather 35 ms  -> ~6-7 ms device (VPU dynamic_gather, no MXU waste)

The production kernel (`adc_scan_topk_fused`) adds in-tile top-k
extraction so the [Q, n] matrix never reaches HBM: 10.6 ms/batch device
vs 24.0 for the XLA chunked SEARCH at 1M, bit-exact ids+distances.
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRECISION = jax.lax.Precision.HIGHEST


def _round_up(x, m):
    return -(-x // m) * m


# -- variant kt: [k, tn] one-hot, natural matmul orientation ---------------


def _adc_kt_kernel(tab_ref, codes_ref, out_ref, *, m, k):
    tn = out_ref.shape[1]
    q = tab_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (k, tn), 0)
    acc = jnp.zeros((q, tn), jnp.float32)
    for i in range(m):
        c = codes_ref[i, :].astype(jnp.int32)  # [tn]
        onehot = (row == c[None, :]).astype(jnp.float32)  # [k, tn]
        acc = acc + jax.lax.dot_general(
            tab_ref[:, i, :], onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PRECISION,
        )
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def adc_kt(tables, codes_t, block: int, interpret: bool = False):
    q, m, k = tables.shape
    n = codes_t.shape[1]
    q_pad = _round_up(q, 8)
    tab = jnp.pad(tables, ((0, q_pad - q), (0, 0), (0, 0)))
    n_pad = _round_up(n, block)
    cp = jnp.pad(codes_t, ((0, 0), (0, n_pad - n)))
    out = pl.pallas_call(
        functools.partial(_adc_kt_kernel, m=m, k=k),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((q_pad, m, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_pad, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(tab, cp)
    return out[:q, :n]


# -- variant gather: VPU lane gather, no one-hot ----------------------------


def _adc_gather_kernel(tab_ref, codes_ref, out_ref, *, m, k, only=0):
    tn = out_ref.shape[1]
    q = tab_ref.shape[0]
    subspaces = range(only) if only else range(m)
    for s in range(0, tn, 128):
        acc = jnp.zeros((q, 128), jnp.float32)
        for i in subspaces:
            c = codes_ref[i, s:s + 128].astype(jnp.int32)  # [128]
            idx = jnp.broadcast_to(c[None, :], (q, 128))
            if k <= 128:
                g = jnp.take_along_axis(tab_ref[:, i, :], idx, axis=1)
            else:
                lo = tab_ref[:, i, :128]
                hi = tab_ref[:, i, 128:256]
                m7 = jnp.bitwise_and(idx, 127)
                g = jnp.where(
                    idx < 128,
                    jnp.take_along_axis(lo, m7, axis=1),
                    jnp.take_along_axis(hi, m7, axis=1),
                )
            acc = acc + g
        out_ref[:, s:s + 128] = acc


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "only")
)
def adc_gather(
    tables, codes_t, block: int, interpret: bool = False, only: int = 0
):
    q, m, k = tables.shape
    assert k <= 256
    n = codes_t.shape[1]
    q_pad = _round_up(q, 8)
    tab = jnp.pad(tables, ((0, q_pad - q), (0, 0), (0, 0)))
    n_pad = _round_up(n, block)
    cp = jnp.pad(codes_t, ((0, 0), (0, n_pad - n)))
    out = pl.pallas_call(
        functools.partial(_adc_gather_kernel, m=m, k=k, only=only),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((q_pad, m, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_pad, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(tab, cp)
    return out[:q, :n]


# -- floor diagnostic: same DMA in / out shapes, no table lookup ------------


def _adc_floor_kernel(tab_ref, codes_ref, out_ref, *, m, k):
    tn = out_ref.shape[1]
    q = tab_ref.shape[0]
    c = codes_ref[0, :].astype(jnp.int32).astype(jnp.float32)
    out_ref[:, :] = jnp.broadcast_to(
        (c + tab_ref[0, 0, 0])[None, :], (q, tn)
    )


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def adc_floor(tables, codes_t, block: int, interpret: bool = False):
    q, m, k = tables.shape
    n = codes_t.shape[1]
    q_pad = _round_up(q, 8)
    tab = jnp.pad(tables, ((0, q_pad - q), (0, 0), (0, 0)))
    n_pad = _round_up(n, block)
    cp = jnp.pad(codes_t, ((0, 0), (0, n_pad - n)))
    out = pl.pallas_call(
        functools.partial(_adc_floor_kernel, m=m, k=k),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((q_pad, m, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_pad, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(tab, cp)
    return out[:q, :n]


def measure(fn, probe, reps=(2, 8), settle=1):
    """Amortized per-call seconds with forced completion (bench.py style)."""
    int(probe(fn()))  # warm

    def run(r):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(r)]
        for o in outs:
            int(probe(o))
        return time.perf_counter() - t0

    for _ in range(settle):
        run(2)
    r0, r1 = reps
    t0 = min(run(r0) for _ in range(2))
    t1 = min(run(r1) for _ in range(2))
    return max((t1 - t0) / (r1 - r0), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--q", type=int, default=128)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--block", type=int, default=2048)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    from vq_tpu.models.pq import _adc_lookup_jit
    from vq_tpu.ops.pallas_kernels import adc_lookup_fused

    kq, kc = jax.random.split(jax.random.PRNGKey(66))
    tables = jax.random.uniform(kq, (args.q, args.m, args.k), jnp.float32)
    codes = jax.random.randint(
        kc, (args.n, args.m), 0, args.k, dtype=jnp.int32
    ).astype(jnp.uint8)
    codes_i32 = codes.astype(jnp.int32)
    codes_t = codes.T.copy()  # [m, n] u8, lane-contiguous per subspace

    @jax.jit
    def probe(x):
        return jnp.sum(x[:4, :128]) + jnp.sum(x[-4:, -128:])

    interp = bool(args.interpret)
    variants = {
        "xla": lambda: _adc_lookup_jit(tables, codes_i32),
        "old": lambda: adc_lookup_fused(
            tables, codes, block_cols=args.block, interpret=interp
        ),
        "kt": lambda: adc_kt(tables, codes_t, args.block, interpret=interp),
        "gather": lambda: adc_gather(
            tables, codes_t, args.block, interpret=interp
        ),
        "floor": lambda: adc_floor(
            tables, codes_t, args.block, interpret=interp
        ),
        "gather1": lambda: adc_gather(
            tables, codes_t, args.block, interpret=interp, only=1
        ),
    }
    if args.only:
        keep = set(args.only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep or k == "xla"}

    ref = np.asarray(variants["xla"]()[:8, :4096])
    for name, fn in variants.items():
        got = np.asarray(fn()[:8, :4096])
        ok = bool(np.allclose(got, ref, atol=1e-4)) or name in (
            "floor", "gather1"
        )
        per = measure(fn, probe)
        print(json.dumps({
            "variant": name, "ms": round(per * 1e3, 2),
            "parity": bool(ok),
            "mvecs_per_s": round(args.n / per / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()

"""Deep-TSVQ encode timing: depth 10 vs depth 12 at 1M x 384.

Round-5 done-check for the wide-level traversal (VERDICT r4 #5): the
level-sliced fast path used to cap at 4096 nodes (depth >= 12 silently
kept the slow gather form). With levels >= 1024 wide gathering child
rows (O(d)/row, width-independent), a depth-12 (8191-node) encode must
land within 2x the depth-10 time — and stay bit-identical to the
original gather traversal (reference descent rule: src/tsvq.rs:117-132).

Uniform training data splits at medians into a complete tree, so
depth d gives 2^(d+1)-1 nodes. Encode rates are RPC-subtracted
scan-chained device times (T=8).

Usage: python benchmarks/tsvq_deep.py [--output <jsonl>]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks._artifact import Rows
from vq_tpu.models.tsvq import (
    _find_leaves, _tsvq_find_leaf, tsvq_build_batched,
)
from vq_tpu.ops.distance import Metric

RPC = 0.0293
T = 8


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
    return max((t2 - t1) / 4 - RPC, 1e-9) / T * 1e3


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=384)
    p.add_argument("--train", type=int, default=300_000)
    p.add_argument("--depths", type=int, nargs="+", default=[10, 12])
    p.add_argument("--output", type=str, default=None)
    args = p.parse_args(argv)

    art = Rows(args.output)
    rng = np.random.default_rng(66)
    train = jnp.asarray(
        rng.random((args.train, args.dim), dtype=np.float32)
    )
    x = jnp.asarray(rng.random((args.n, args.dim), dtype=np.float32))

    for depth in args.depths:
        t0 = time.perf_counter()
        tree = tsvq_build_batched(train, depth)
        build_s = time.perf_counter() - t0
        print(f"depth {depth}: {tree.num_nodes} nodes, "
              f"build {build_s:.1f} s", flush=True)

        def enc(t, x_, _tree=tree):
            leaves = _find_leaves(
                _tree, x_ + 1e-6 * jnp.float32(t), Metric.EUCLIDEAN
            )
            return jnp.sum(leaves)

        ms = round(chain_ms(enc, (x,)), 3)

        # Bit-identity vs the original gather traversal (the slow form
        # the fast path replaced) on a 100k sample.
        sample = x[:100_000]
        fast = np.asarray(
            _find_leaves(tree, sample, Metric.EUCLIDEAN)
        )
        # num_nodes > 128, so _tsvq_find_leaf takes its per-level
        # gather branch (the scores form requires <= 128 nodes).
        gather = np.asarray(_tsvq_find_leaf(
            sample, tree.centroids, tree.left, tree.right,
            Metric.EUCLIDEAN, tree.depth,
        ))
        match = float((fast == gather).mean())
        # On TPU the two traversals use different float formulations
        # (matmul scores vs rowwise distances), so rows at near-tie
        # descent decisions may land on different leaves. Check every
        # mismatch really is a tie: the two chosen leaves' distances
        # must agree to float noise (a routing bug would land on a
        # FARTHER leaf).
        mm = np.nonzero(fast != gather)[0]
        max_rel_gap = 0.0
        if mm.size:
            cs = np.asarray(tree.centroids)
            xs = np.asarray(sample[mm])
            d_fast = np.sum((xs - cs[fast[mm]]) ** 2, axis=1)
            d_gather = np.sum((xs - cs[gather[mm]]) ** 2, axis=1)
            denom = np.maximum(np.sum(xs * xs, axis=1), 1e-9)
            max_rel_gap = float(
                np.max(np.abs(d_fast - d_gather) / denom)
            )
        print(f"depth {depth}: {ms} ms/1M, gather-parity {match}, "
              f"mismatch max rel dist gap {max_rel_gap:.2e}", flush=True)
        art.emit(bench="tsvq_deep", depth=depth,
                 num_nodes=int(tree.num_nodes), n=args.n, dim=args.dim,
                 build_s=round(build_s, 2), encode_ms_device=ms,
                 gather_parity=match,
                 mismatch_max_rel_dist_gap=max_rel_gap)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""End-to-end integration tests — cross-algorithm workflows.

Mirrors the reference's integration suites (reference
tests/integration_tests.rs and pyvq/tests/test_integrations.py): all four
quantizers over the same data, RMSE bounds, all-distance sweeps, chained
quantization, scale smoke tests, duplicate training vectors, and the eval
CLI + checkpoint round-trip flows specific to this framework.
"""

import json

import numpy as np
import pytest

import vq_tpu
from vq_tpu import (
    TSVQ,
    BinaryQuantizer,
    Metric,
    ProductQuantizer,
    ScalarQuantizer,
)


@pytest.fixture(scope="module")
def corpus(rng):
    return rng.random((2000, 32), dtype=np.float32)


def test_all_four_quantizers_same_data(corpus):
    # reference integration_tests.rs:11-37
    outs = {}
    bq = BinaryQuantizer(0.5)
    outs["bq"] = np.asarray(bq.dequantize(bq.quantize(corpus)))
    sq = ScalarQuantizer(0.0, 1.0, 256)
    outs["sq"] = np.asarray(sq.dequantize(sq.quantize(corpus)))
    pq = ProductQuantizer(corpus, 4, 16, max_iters=5)
    outs["pq"] = np.asarray(pq.decode(pq.encode(corpus)))
    ts = TSVQ(corpus, max_depth=5)
    outs["tsvq"] = np.asarray(ts.decode(ts.encode(corpus)))
    for name, recon in outs.items():
        assert recon.shape == corpus.shape, name
        assert np.isfinite(recon).all(), name


def test_rmse_ordering(corpus):
    # SQ-256 on [0,1] data must beat BQ; PQ must beat TSVQ at tiny depth.
    def rmse(recon):
        return float(np.sqrt(np.mean((corpus - recon) ** 2)))

    sq = ScalarQuantizer(0.0, 1.0, 256)
    bq = BinaryQuantizer(0.5)
    r_sq = rmse(np.asarray(sq.dequantize(sq.quantize(corpus))))
    r_bq = rmse(np.asarray(bq.dequantize(bq.quantize(corpus))))
    assert r_sq < 0.005  # step/sqrt(12) ~ 0.0011
    assert r_bq > r_sq

    pq = ProductQuantizer(corpus, 8, 64, max_iters=8)
    r_pq = rmse(np.asarray(pq.decode(pq.encode(corpus))))
    ts = TSVQ(corpus, max_depth=2)
    r_ts = rmse(np.asarray(ts.decode(ts.encode(corpus))))
    assert r_pq < r_ts  # 64^8 effective cells vs 4 leaves


@pytest.mark.parametrize(
    "metric", ["squared_euclidean", "euclidean", "manhattan", "cosine"]
)
def test_pq_all_distances(corpus, metric):
    # reference integration_tests.rs:246-264
    pq = ProductQuantizer(corpus[:500], 4, 8, max_iters=3, distance=metric)
    codes = np.asarray(pq.encode(corpus[:100]))
    assert codes.shape == (100, 4)
    assert codes.max() < 8
    # ADC distances must be finite and non-negative for every metric
    d = np.asarray(pq.adc_distances(corpus[:3], codes))
    assert np.isfinite(d).all()
    assert (d >= 0).all()


def test_chained_sq_then_bq(corpus):
    # reference pyvq test_integrations.py:152-169 — chain SQ output into BQ.
    sq = ScalarQuantizer(0.0, 1.0, 16)
    mid = np.asarray(sq.dequantize(sq.quantize(corpus)))
    bq = BinaryQuantizer(0.5)
    final = np.asarray(bq.dequantize(bq.quantize(mid)))
    assert set(np.unique(final)).issubset({0.0, 1.0})


def test_pq_scale_10k(rng):
    # reference pyvq test_integrations.py:175-197 — 10k x 64, k=256.
    data = rng.random((10_000, 64), dtype=np.float32)
    pq = ProductQuantizer(data, 8, 256, max_iters=3)
    codes = np.asarray(pq.encode(data))
    assert codes.shape == (10_000, 8) and codes.dtype == np.uint8
    recon = np.asarray(pq.decode(codes))
    rmse = float(np.sqrt(np.mean((data - recon) ** 2)))
    assert rmse < 0.25  # uniform data sigma ~0.29; PQ must beat no-op


def test_duplicate_training_vectors(rng):
    # reference pyvq test_integrations.py:241-257 — dup rows must not break
    # training (empty-cluster reseeding handles collapsed clusters).
    row = rng.random((1, 16), dtype=np.float32)
    data = np.repeat(row, 64, axis=0)
    pq = ProductQuantizer(data, 4, 4, max_iters=3)
    codes = np.asarray(pq.encode(data))
    recon = np.asarray(pq.decode(codes))
    np.testing.assert_allclose(recon, data, atol=1e-5)


def test_adc_search_finds_self(corpus):
    # The encoded corpus's own vectors must rank themselves (or an
    # identically-coded row) first by ADC distance.
    pq = ProductQuantizer(corpus, 8, 32, max_iters=8)
    codes = pq.encode(corpus)
    idx, dist = pq.adc_search(corpus[:20], codes, k=1)
    idx = np.asarray(idx)[:, 0]
    codes_np = np.asarray(codes)
    for qi, found in enumerate(idx):
        # the found row must share the query's exact code word
        np.testing.assert_array_equal(codes_np[found], codes_np[qi])


def test_eval_cli_end_to_end(tmp_path, capsys):
    # The framework's own eval harness runs end to end and emits valid JSONL.
    from vq_tpu.cli import eval_pq, eval_sq

    out = tmp_path / "pq.jsonl"
    eval_pq.main(
        ["--sizes", "500", "--dim", "16", "--m", "4", "--k", "8",
         "--max-iters", "2", "--output", str(out), "--recall"]
    )
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert rows and rows[0]["algorithm"] == "pq"
    assert rows[0]["mse"] > 0 and 0 <= rows[0]["recall_at_k"] <= 1

    eval_sq.main(["--sizes", "500", "--dim", "16", "--output", "-"])
    printed = capsys.readouterr().out.strip().splitlines()
    assert json.loads(printed[-1])["algorithm"] == "sq"


def test_checkpoint_train_resume_equivalence(rng):
    # Resumable training: running 2+3 iterations via a checkpoint equals
    # running 5 straight when resuming with the same key stream is not
    # required — we assert the checkpointed state is usable and improves.
    from vq_tpu.ops.kmeans import lloyd

    data = rng.random((512, 8), dtype=np.float32)
    r2 = lloyd(data, 8, max_iters=2, seed=9)
    pq = ProductQuantizer(
        codebooks=np.asarray(r2.centroids)[None], distance="euclidean"
    )
    assert pq.num_subspaces == 1
    r5 = lloyd(data, 8, max_iters=20, seed=9)
    assert float(r5.inertia) <= float(r2.inertia) + 1e-4


def test_fit_transform_roundtrip(corpus):
    # Reference roadmap item: fit_transform (ROADMAP.md §3). Constructors
    # fit; fit_transform/transform encode.
    pq = ProductQuantizer(corpus, 4, 16, max_iters=3)
    codes = np.asarray(pq.fit_transform(corpus))
    np.testing.assert_array_equal(codes, np.asarray(pq.encode(corpus)))
    sq = ScalarQuantizer(0.0, 1.0, 16)
    np.testing.assert_array_equal(
        np.asarray(sq.fit_transform(corpus)), np.asarray(sq.quantize(corpus))
    )
    ts = TSVQ(corpus, max_depth=3)
    np.testing.assert_array_equal(
        np.asarray(ts.transform(corpus)), np.asarray(ts.encode(corpus))
    )


def test_eval_cli_recall_all_algos(capsys):
    """--recall on every CLI (device-side windowed recall path)."""
    from vq_tpu.cli import eval_bq, eval_sq, eval_tsvq

    eval_sq.main(["--sizes", "600", "--dim", "8", "--recall", "--output", "-"])
    eval_bq.main(["--sizes", "600", "--dim", "8", "--recall", "--output", "-"])
    eval_tsvq.main(
        ["--sizes", "600", "--dim", "8", "--max-depth", "3", "--recall",
         "--output", "-"]
    )
    import json

    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 3
    for r in rows:
        assert 0.0 <= r["recall_at_k"] <= 1.0
    # SQ at 256 levels reconstructs almost perfectly -> recall ~1.
    assert rows[0]["recall_at_k"] > 0.9

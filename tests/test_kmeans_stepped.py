"""Stepped Lloyd trainer: metrics stream, checkpointing, resume."""

import json

import numpy as np
import pytest

from vq_tpu.ops.kmeans import lloyd
from vq_tpu.ops.kmeans_stepped import lloyd_stepped
from vq_tpu.utils.metrics import MetricsLogger


@pytest.fixture(scope="module")
def data(rng):
    return rng.random((512, 16), dtype=np.float32)


def test_stepped_matches_jitted_loop(data):
    # Same key stream -> same trajectory as the while_loop implementation.
    a = lloyd(data, 8, max_iters=6, seed=3)
    b = lloyd_stepped(data, 8, max_iters=6, seed=3)
    np.testing.assert_allclose(
        np.asarray(a.centroids), np.asarray(b.centroids), rtol=1e-6, atol=1e-6
    )
    assert int(a.iterations) == int(b.iterations)
    assert bool(a.converged) == bool(b.converged)


def test_metrics_stream(data, tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    with MetricsLogger(path) as logger:
        res = lloyd_stepped(data, 8, max_iters=4, seed=0, logger=logger)
    events = [json.loads(line) for line in open(path)]
    iters = [e for e in events if e["event"] == "kmeans_iter"]
    assert len(iters) == int(res.iterations)
    for e in iters:
        assert e["inertia"] > 0
        assert e["occupancy_min"] >= 0
        assert e["step_s"] >= 0
    # inertia should be non-increasing after the first refinement
    vals = [e["inertia"] for e in iters]
    assert vals[-1] <= vals[0] + 1e-3


def test_checkpoint_resume(data, tmp_path):
    ck = str(tmp_path / "km.npz")
    full = lloyd_stepped(data, 8, max_iters=6, seed=5)
    # Run 3 iterations with checkpointing, then resume for the rest.
    lloyd_stepped(data, 8, max_iters=3, seed=5, checkpoint_path=ck)
    resumed = lloyd_stepped(data, 8, max_iters=6, seed=5, resume_from=ck)
    np.testing.assert_allclose(
        np.asarray(full.centroids),
        np.asarray(resumed.centroids),
        rtol=1e-6,
        atol=1e-6,
    )


def test_resume_shape_mismatch(data, tmp_path):
    from vq_tpu.errors import InvalidParameter

    ck = str(tmp_path / "km.npz")
    lloyd_stepped(data, 8, max_iters=1, seed=0, checkpoint_path=ck)
    with pytest.raises(InvalidParameter):
        lloyd_stepped(data, 16, max_iters=2, seed=0, resume_from=ck)


def test_logger_callback_sink(data):
    events = []
    logger = MetricsLogger(events.append)
    lloyd_stepped(data, 4, max_iters=2, seed=1, logger=logger)
    assert events and events[0]["event"] == "kmeans_iter"

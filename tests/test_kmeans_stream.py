"""Mini-batch / streaming k-means tests."""

import numpy as np
import pytest

from vq_tpu.errors import InvalidParameter
from vq_tpu.ops.kmeans import lloyd
from vq_tpu.ops.kmeans_stream import lloyd_minibatch


@pytest.fixture(scope="module")
def blobs():
    # 4 well-separated gaussian blobs in 8-d. Local generator: the shared
    # session rng's cursor depends on test order, which made center
    # separation (and thus the recovery bound) order-dependent.
    rng = np.random.default_rng(1234)
    centers = rng.random((4, 8)).astype(np.float32) * 20
    data = np.concatenate(
        [c + rng.normal(0, 0.3, (500, 8)).astype(np.float32) for c in centers]
    )
    rng2 = np.random.default_rng(0)
    rng2.shuffle(data)
    return data.astype(np.float32), centers


def test_minibatch_near_full_lloyd(blobs):
    data, _ = blobs
    mb = lloyd_minibatch(data, 4, batch_size=256, epochs=4, seed=1)
    full = lloyd(data, 4, max_iters=20, seed=1)
    # Mini-batch inertia within 10% of full Lloyd's on easy blobs.
    assert float(mb.inertia) < 1.1 * float(full.inertia)
    assert int(mb.iterations) == 4 * (2000 // 256 + 1)


def test_minibatch_recovers_blob_centers(blobs):
    data, centers = blobs
    res = lloyd_minibatch(data, 4, batch_size=512, epochs=5, seed=0)
    got = np.asarray(res.centroids)
    # Each true center has a learned centroid within 1.0 — far below the
    # ~10+ inter-center distances, loose enough for mini-batch noise (no
    # empty-cluster reseeding exists in online k-means).
    for c in centers:
        assert np.min(np.linalg.norm(got - c, axis=1)) < 1.0


def test_streamed_batches(blobs):
    data, _ = blobs
    init = data[:4]

    def gen():
        for lo in range(0, len(data), 400):
            yield data[lo : lo + 400]

    res = lloyd_minibatch(gen(), 4, init=init)
    assert res.centroids.shape == (4, 8)
    assert int(res.iterations) == 5
    assert np.isfinite(np.asarray(res.centroids)).all()


def test_stream_requires_init(blobs):
    data, _ = blobs
    with pytest.raises(InvalidParameter):
        lloyd_minibatch(iter([data]), 4)


def test_validation():
    with pytest.raises(InvalidParameter):
        lloyd_minibatch(np.zeros((3, 2), np.float32), 5)

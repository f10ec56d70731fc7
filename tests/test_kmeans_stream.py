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


def test_pq_minibatch_update_matches_per_subspace_loop():
    """pq_minibatch_update is exactly a vmap of minibatch_update over
    subspaces — centroids, counts, and inertia agree per subspace."""
    import jax.numpy as jnp

    from vq_tpu.ops.kmeans_stream import minibatch_update, pq_minibatch_update

    r = np.random.default_rng(5)
    m, k, s, b = 4, 8, 6, 64
    cents = jnp.asarray(r.random((m, k, s), dtype=np.float32))
    counts = jnp.asarray(r.integers(0, 50, (m, k)).astype(np.float32))
    batch = jnp.asarray(r.random((b, m * s), dtype=np.float32))

    nc, nct, inertia = pq_minibatch_update(cents, counts, batch)
    xb = np.asarray(batch).reshape(b, m, s)
    for i in range(m):
        ci, cti, ii = minibatch_update(
            cents[i], counts[i], jnp.asarray(xb[:, i, :]), k
        )
        np.testing.assert_allclose(np.asarray(nc[i]), np.asarray(ci),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(nct[i]), np.asarray(cti))
        np.testing.assert_allclose(float(inertia[i]), float(ii), rtol=1e-5)


def test_pq_minibatch_update_shape_validation():
    import jax.numpy as jnp

    from vq_tpu.ops.kmeans_stream import pq_minibatch_update
    from vq_tpu.errors import InvalidParameter

    cents = jnp.zeros((2, 4, 3))
    counts = jnp.zeros((2, 4))
    with pytest.raises(InvalidParameter):
        pq_minibatch_update(cents, counts, jnp.zeros((8, 5)))


def test_stream_harness_kill_resume_matches_uninterrupted(tmp_path):
    """benchmarks/stream_100M.py (scaled down): a run killed mid-stream
    and resumed from its checkpoint produces EXACTLY the centroids of an
    uninterrupted run — the block-indexed key schedule makes the resumed
    run consume identical blocks in identical order."""
    import subprocess
    import sys

    base = [
        sys.executable, "-u", "benchmarks/stream_100M.py", "--cpu",
        "--n-total", str(8 * 2048), "--dim", "32", "--m", "4", "--k", "8",
        "--block-rows", "2048", "--blocks-per-superblock", "2",
        "--skip-eval",
    ]

    def run(extra, ck, out, expect_rc=0):
        r = subprocess.run(
            base + ["--checkpoint", str(ck), "--output", str(out)] + extra,
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == expect_rc, (r.returncode, r.stdout, r.stderr)

    ck_a, out_a = tmp_path / "a.npz", tmp_path / "a.jsonl"
    run([], ck_a, out_a)

    ck_b, out_b = tmp_path / "b.npz", tmp_path / "b.jsonl"
    run(["--kill-after", "2"], ck_b, out_b, expect_rc=42)
    st = np.load(ck_b)
    assert 0 < int(st["cursor"]) < 8  # really stopped mid-stream
    run(["--resume"], ck_b, out_b)

    a, b = np.load(ck_a), np.load(ck_b)
    np.testing.assert_array_equal(a["centroids"], b["centroids"])
    np.testing.assert_array_equal(a["counts"], b["counts"])

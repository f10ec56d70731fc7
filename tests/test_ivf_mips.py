"""IVF-PQ MIPS (metric="dot") and the non-residual L2 search contract."""

import numpy as np
import pytest

from vq_tpu.errors import InvalidParameter
from vq_tpu.ivf import IVFPQIndex, _ivf_search_jit


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(23)
    centers = rng.normal(0, 2.0, (12, 24)).astype(np.float32)
    which = rng.integers(0, 12, 2500)
    x = centers[which] + rng.normal(0, 0.25, (2500, 24)).astype(np.float32)
    return x.astype(np.float32)


def _brute(idx, queries):
    """Exact metric values against the index's own reconstructions."""
    codes = idx._pool.gather_rows("codes", np.arange(idx.ntotal))
    recon = np.asarray(idx.pq.decode(codes.astype(np.int32)))
    if idx.by_residual:
        recon = recon + np.asarray(idx.coarse)[idx._flat_lists]
    if idx.metric == "dot":
        return queries @ recon.T  # larger = better
    d = queries[:, None, :] - recon[None]
    return np.sum(d * d, axis=-1)


def test_nonresidual_l2_search_is_correct(clustered):
    """Regression: _ivf_search_jit always built tables from q - c_probe,
    which is wrong for by_residual=False (codes reconstruct raw vectors).
    Search with full probing must now return the true ADC distances."""
    idx = IVFPQIndex.train(
        clustered, nlist=6, num_subspaces=4, num_centroids=32,
        max_iters=6, by_residual=False,
    )
    assert not idx.by_residual
    idx.add(clustered)
    q = clustered[:7] + 0.05
    ids, dist = idx.search(q, k=5, nprobe=6, use_pallas=False)
    brute = _brute(idx, q)
    want = np.sort(brute, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(dist), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("by_residual", [False, True])
def test_dot_search_matches_bruteforce(clustered, by_residual):
    idx = IVFPQIndex.train(
        clustered, nlist=6, num_subspaces=4, num_centroids=32,
        max_iters=6, metric="dot", by_residual=by_residual,
    )
    idx.add(clustered)
    rng = np.random.default_rng(5)
    q = rng.normal(0, 1, (9, 24)).astype(np.float32)
    # Full probing -> every candidate seen -> scores must equal the true
    # top-k inner products against the reconstructions, descending.
    ids, scores = idx.search(q, k=5, nprobe=6, use_pallas=False)
    brute = _brute(idx, q)
    want = -np.sort(-brute, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(scores), want, rtol=1e-4,
                               atol=1e-3)
    assert np.all(np.diff(np.asarray(scores), axis=1) <= 1e-5)


def test_dot_pallas_matches_xla(clustered):
    idx = IVFPQIndex.train(
        clustered, nlist=8, num_subspaces=4, num_centroids=16,
        max_iters=5, metric="dot",
    )
    idx.add(clustered)
    bucket_codes, bucket_ids, chains = idx._build_buckets()
    import jax.numpy as jnp

    q = jnp.asarray(clustered[:6])
    args = (q, idx.coarse, idx.pq.codebooks, bucket_codes, bucket_ids,
            chains, 4, 7, idx._pool.cap)
    kw = dict(metric="dot", by_residual=idx.by_residual)
    ids_x, d_x = _ivf_search_jit(*args, use_pallas=False, **kw)
    ids_p, d_p = _ivf_search_jit(*args, use_pallas=True, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_x))
    np.testing.assert_allclose(
        np.asarray(d_p), np.asarray(d_x), rtol=1e-4, atol=1e-4
    )


def test_dot_train_uses_anisotropic_pq(clustered):
    from vq_tpu.models.pq_anisotropic import AnisotropicProductQuantizer

    idx = IVFPQIndex.train(
        clustered, nlist=6, num_subspaces=4, num_centroids=16,
        max_iters=4, metric="dot",
    )
    assert isinstance(idx.pq, AnisotropicProductQuantizer)
    assert not idx.by_residual  # score-aware coding needs raw directions
    assert "dot" in repr(idx)


def test_dot_recall_and_padding(clustered):
    idx = IVFPQIndex.train(
        clustered, nlist=8, num_subspaces=4, num_centroids=32,
        max_iters=6, metric="dot",
    )
    idx.add(clustered)
    rng = np.random.default_rng(9)
    q = rng.normal(0, 1, (40, 24)).astype(np.float32)
    ids, scores = idx.search(q, k=10, nprobe=4)
    true = np.argsort(-(q @ clustered.T), axis=1)[:, :10]

    def recall(found):
        return np.mean([
            len(set(map(int, a)) & set(map(int, b))) / 10
            for a, b in zip(np.asarray(found), true)
        ])

    # The PQ itself bounds recall on this near-tie data; the IVF machinery
    # must recover nearly the full-scan-over-reconstructions ceiling while
    # probing half the lists.
    codes = idx._pool.gather_rows("codes", np.arange(idx.ntotal))
    recon = np.asarray(idx.pq.decode(codes.astype(np.int32)))
    ceiling = recall(np.argsort(-(q @ recon.T), axis=1)[:, :10])
    assert recall(ids) >= 0.8 * ceiling
    assert recall(ids) > 0.05  # >> random (10/2500)
    # Padding contract: k beyond the pool pads with -1 / -inf.
    ids2, s2 = idx.search(q[:2], k=3000, nprobe=1)
    pad = np.asarray(ids2[0]) == -1
    assert pad.any()
    assert np.all(np.asarray(s2[0])[pad] == -np.inf)


def test_dot_rerank_exact(clustered):
    idx = IVFPQIndex.train(
        clustered, nlist=6, num_subspaces=4, num_centroids=16,
        max_iters=4, metric="dot", keep_corpus=True,
    )
    idx.add(clustered)
    rng = np.random.default_rng(2)
    q = rng.normal(0, 1, (5, 24)).astype(np.float32)
    ids, scores = idx.search(q, k=4, nprobe=6, rerank=200)
    exact = q @ clustered.T
    want = -np.sort(-exact, axis=1)[:, :4]
    np.testing.assert_allclose(np.asarray(scores), want, rtol=1e-5,
                               atol=1e-4)


def test_metric_save_load_roundtrip(clustered, tmp_path):
    idx = IVFPQIndex.train(
        clustered, nlist=6, num_subspaces=4, num_centroids=16,
        max_iters=4, metric="dot",
    )
    idx.add(clustered)
    p = idx.save(str(tmp_path / "mips.npz"))
    back = IVFPQIndex.load(p)
    assert back.metric == "dot"
    assert type(back.pq).__name__ == "AnisotropicProductQuantizer"
    assert back.pq.eta == idx.pq.eta
    q = clustered[:4]
    a = idx.search(q, k=5, nprobe=6, use_pallas=False)
    b = back.search(q, k=5, nprobe=6, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=1e-6)


def test_metric_validation(clustered):
    with pytest.raises(InvalidParameter):
        IVFPQIndex.train(
            clustered, nlist=4, num_subspaces=4, num_centroids=8,
            metric="cosine",
        )


@pytest.mark.parametrize(
    "metric,by_residual", [("dot", False), ("dot", True), ("l2", False)]
)
def test_sharded_search_matches_single_device(clustered, metric, by_residual):
    """List-sharded search must return the same ids/values as the
    single-device path for every metric/coding combination (8-device
    virtual mesh)."""
    from vq_tpu.parallel import sharded_ivf_search

    idx = IVFPQIndex.train(
        clustered, nlist=10, num_subspaces=4, num_centroids=16,
        max_iters=4, metric=metric, by_residual=by_residual,
    )
    idx.add(clustered)
    rng = np.random.default_rng(6)
    q = rng.normal(0, 1, (7, 24)).astype(np.float32)
    ids_1, val_1 = idx.search(q, k=6, nprobe=5, use_pallas=False)
    ids_s, val_s = sharded_ivf_search(idx, q, k=6, nprobe=5)
    np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_1))
    np.testing.assert_allclose(
        np.asarray(val_s), np.asarray(val_1), rtol=1e-5, atol=1e-5
    )

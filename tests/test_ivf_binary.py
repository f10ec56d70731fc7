"""IVFBinaryIndex: Hamming IVF over packed sign bits.

Contract tests mirror the other IVF variants (probe semantics, padding,
removal, save/load) plus binary-specific oracles: probed Hamming values
must equal the brute-force packed-domain distances on the probed lists,
and full-probe search must equal the flat BinaryIndex ranking.
"""

import numpy as np
import pytest

from vq_tpu import IVFBinaryIndex, InvalidData
from vq_tpu.models.bq import hamming_distance, pack_bits
from vq_tpu.search import BinaryIndex


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(29)
    centers = rng.normal(0, 2.0, (12, 40)).astype(np.float32)
    which = rng.integers(0, 12, 1500)
    return (centers[which] + rng.normal(0, 0.3, (1500, 40))).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def idx(corpus):
    ix = IVFBinaryIndex.train(corpus, nlist=12, seed=3)
    ix.add(corpus)
    return ix


class TestSearch:
    def test_full_probe_matches_flat_binary(self, corpus, idx):
        """nprobe=nlist visits every list -> flat Hamming ranking."""
        q = corpus[:6] + 0.05
        flat = BinaryIndex(corpus.shape[1])
        flat.add(corpus)
        ids_f, d_f = flat.search(q, k=5)
        ids_i, d_i = idx.search(q, k=5, nprobe=idx.nlist)
        np.testing.assert_array_equal(
            np.sort(np.asarray(d_i), axis=1),
            np.sort(np.asarray(d_f), axis=1),
        )
        # Ids may differ only among equal-distance ties.
        same = np.asarray(ids_i) == np.asarray(ids_f)
        ties = np.asarray(d_i) == np.asarray(d_f)
        assert (same | ties).all()

    def test_probed_distances_are_exact_hamming(self, corpus, idx):
        q = corpus[:4] + 0.02
        ids, d = idx.search(q, k=3, nprobe=4)
        qp = np.asarray(pack_bits(q >= 0.0))
        allp = np.asarray(
            idx._pool.gather_rows("codes", np.arange(idx.ntotal))
        )
        for r in range(q.shape[0]):
            for c in range(3):
                i = int(ids[r, c])
                if i < 0:
                    continue
                want = int(
                    np.asarray(hamming_distance(qp[r], allp[i]))[0, 0]
                )
                assert int(d[r, c]) == want

    def test_monotone_in_nprobe(self, corpus, idx):
        q = corpus[:8]
        d1 = np.asarray(idx.search(q, k=1, nprobe=1)[1])
        d4 = np.asarray(idx.search(q, k=1, nprobe=4)[1])
        dn = np.asarray(idx.search(q, k=1, nprobe=idx.nlist)[1])
        assert (d4 <= d1 + 1e-6).all() and (dn <= d4 + 1e-6).all()

    def test_small_pool_pads_with_minus_one(self, corpus):
        ix = IVFBinaryIndex.train(corpus[:40], nlist=8, seed=1)
        ix.add(corpus[:40])
        ids, d = ix.search(corpus[:3], k=30, nprobe=1)
        assert ids.shape == (3, 30)
        assert (np.asarray(ids) == -1).any()
        assert np.isinf(np.asarray(d)).any()

    def test_rerank_exact_l2(self, corpus):
        ix = IVFBinaryIndex.train(corpus, nlist=12, seed=3, keep_corpus=True)
        ix.add(corpus)
        q = corpus[:5] + 0.01
        ids, d = ix.search(q, k=3, nprobe=12, rerank=200)
        # Reranked distances are exact squared-L2 to the returned rows.
        for r in range(5):
            i = int(ids[r, 0])
            want = float(((corpus[i] - q[r]) ** 2).sum())
            np.testing.assert_allclose(float(d[r, 0]), want, rtol=1e-4)
        # Candidate pool covered everything -> top-1 is the true neighbor.
        full = ((corpus[None] - q[:, None]) ** 2).sum(-1)
        np.testing.assert_array_equal(
            np.asarray(ids)[:, 0], full.argmin(1)
        )

    def test_rerank_without_corpus_raises(self, idx, corpus):
        with pytest.raises(InvalidData):
            idx.search(corpus[:2], k=3, rerank=50)


class TestLifecycle:
    def test_remove_ids_renumbers(self, corpus):
        ix = IVFBinaryIndex.train(corpus, nlist=8, seed=5)
        ix.add(corpus[:100])
        removed = ix.remove_ids([0, 5, 99])
        assert removed == 3
        assert ix.ntotal == 97
        ids, _ = ix.search(corpus[:4], k=5, nprobe=8)
        assert int(np.asarray(ids).max()) < 97

    def test_save_load_roundtrip(self, corpus, idx, tmp_path):
        p = idx.save(str(tmp_path / "bivf.npz"))
        back = IVFBinaryIndex.load(p)
        q = corpus[:5]
        ids0, d0 = idx.search(q, k=4, nprobe=6)
        ids1, d1 = back.search(q, k=4, nprobe=6)
        np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    def test_generic_load_index(self, corpus, idx, tmp_path):
        from vq_tpu import load_index

        p = idx.save(str(tmp_path / "bivf2.npz"))
        back = load_index(p)
        assert isinstance(back, IVFBinaryIndex)
        assert back.ntotal == idx.ntotal

    def test_rebalance_requires_corpus(self, idx):
        with pytest.raises(InvalidData):
            idx.rebalance(target_max=10)

    def test_rebalance_with_corpus(self, corpus):
        rng = np.random.default_rng(7)
        skew = corpus[rng.integers(0, 40, 800)]  # pile onto few lists
        ix = IVFBinaryIndex.train(corpus, nlist=8, seed=5, keep_corpus=True)
        ix.add(np.concatenate([corpus[:200], skew]))
        before = ix.bucket_stats()["max"]
        info = ix.rebalance(target_max=max(64, before // 3))
        assert info["split"] >= 1
        assert ix.bucket_stats()["max"] < before
        ids, _ = ix.search(corpus[:4], k=3, nprobe=ix.nlist)
        assert (np.asarray(ids)[:, 0] >= 0).all()

    def test_reconstruct(self, corpus, idx):
        rec = np.asarray(idx.reconstruct([0, 3]))
        assert rec.shape == (2, corpus.shape[1])
        assert set(np.unique(rec)) <= {0.0, 1.0}

    def test_factory_spec(self, corpus):
        from vq_tpu import index_factory

        f = index_factory(corpus.shape[1], "BIVF12")
        f.train(corpus)
        f.add(corpus)
        ids, d = f.search(corpus[:3], k=4, nprobe=6)
        assert np.asarray(ids).shape == (3, 4)


class TestRangeSearch:
    def test_full_probe_matches_brute_hamming(self, corpus, idx):
        q = corpus[:5] + 0.05
        qp = np.asarray(pack_bits(q >= 0.0))
        allp = np.asarray(
            idx._pool.gather_rows("codes", np.arange(idx.ntotal))
        )
        ham = np.asarray(hamming_distance(qp, allp))  # [Q, n]
        r = 4.0
        ids, vals, counts = idx.range_search(
            q, r, nprobe=idx.nlist, max_results=2048
        )
        ids, vals, counts = (np.asarray(a) for a in (ids, vals, counts))
        np.testing.assert_array_equal(counts, (ham <= r).sum(axis=1))
        for row in range(q.shape[0]):
            got = set(ids[row][ids[row] >= 0].tolist())
            want = set(np.where(ham[row] <= r)[0].tolist())
            assert got == want

    def test_partial_probe_counts(self, corpus, idx):
        q = corpus[:4]
        _, _, c_full = idx.range_search(q, 6.0, nprobe=idx.nlist)
        _, _, c_part = idx.range_search(q, 6.0, nprobe=2)
        assert (np.asarray(c_part) <= np.asarray(c_full)).all()

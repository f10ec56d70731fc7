"""knn_graph: exact graph construction over corpus rows."""

import numpy as np
import pytest

from vq_tpu import knn_graph
from vq_tpu.errors import InvalidParameter


@pytest.fixture(scope="module")
def data(rng):
    return rng.standard_normal((300, 16)).astype(np.float32)


def brute_knn(x, k, include_self):
    d = ((x[None, :, :] - x[:, None, :]) ** 2).sum(-1)
    if not include_self:
        np.fill_diagonal(d, np.inf)
    ids = np.argsort(d, axis=1, kind="stable")[:, :k]
    return ids, np.take_along_axis(d, ids, axis=1)


class TestKnnGraph:
    def test_matches_bruteforce(self, data):
        ids, vals = knn_graph(data, k=5, query_batch=64)
        ref_ids, ref_d = brute_knn(data, 5, include_self=False)
        np.testing.assert_allclose(
            np.asarray(vals), ref_d, rtol=1e-4, atol=1e-4
        )
        agree = (np.asarray(ids) == ref_ids).mean()
        assert agree > 0.99  # near-tie flips only
        assert not (np.asarray(ids) == np.arange(300)[:, None]).any()

    def test_include_self_puts_self_first(self, data):
        ids, vals = knn_graph(data, k=3, include_self=True, query_batch=50)
        np.testing.assert_array_equal(
            np.asarray(ids)[:, 0], np.arange(300)
        )
        assert np.asarray(vals)[:, 0].max() < 1e-3

    def test_dot_metric(self, data):
        ids, scores = knn_graph(data, k=4, metric="dot", query_batch=128)
        s = data @ data.T
        np.fill_diagonal(s, -np.inf)
        ref = np.argsort(-s, axis=1, kind="stable")[:, :4]
        agree = (np.asarray(ids) == ref).mean()
        assert agree > 0.99
        assert (np.diff(np.asarray(scores), axis=1) <= 1e-5).all()

    def test_small_n_pads(self, data):
        ids, vals = knn_graph(data[:4], k=10)
        assert np.asarray(ids).shape == (4, 10)
        assert (np.asarray(ids)[:, 3:] == -1).all()  # only 3 neighbors
        assert np.isinf(np.asarray(vals)[:, 3:]).all()

    def test_ragged_tail_batch(self, data):
        # 300 rows with batch 77: final tile is padded internally
        ids, _ = knn_graph(data, k=2, query_batch=77)
        ref_ids, _ = brute_knn(data, 2, include_self=False)
        assert (np.asarray(ids) == ref_ids).mean() > 0.99

    def test_validation(self, data):
        with pytest.raises(InvalidParameter):
            knn_graph(data, k=0)
        with pytest.raises(InvalidParameter):
            knn_graph(np.zeros((0, 4), np.float32), k=1)

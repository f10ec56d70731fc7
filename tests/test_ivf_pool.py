"""ChunkPool unit tier: the chunked inverted-list storage must agree
with a naive host-side model under arbitrary append / remove / free /
relabel sequences (the property the whole IVF family now stands on)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vq_tpu.ivf_pool import ChunkPool, take_list_ids, take_list_payload


def _model_lists(lists_per_row):
    """Host model: list id -> ids in insertion order."""
    out = {}
    for i, l in enumerate(lists_per_row):
        out.setdefault(int(l), []).append(i)
    return out


def _pool_lists(pool):
    """Read back list membership from the pool structure."""
    sid = np.asarray(pool.slot_ids)
    out = {}
    for l in range(pool.nlist):
        ids = []
        for c in pool._chains_h[l]:
            if c < 0:
                break
            ids.extend(int(i) for i in sid[c] if i >= 0)
        out[l] = ids[: int(pool.lens_h[l])]
    return out


def _check_consistency(pool, lists_np, rows_np):
    """Pool contents == host model, pos/slot_ids inverse, rows exact."""
    model = _model_lists(lists_np)
    got = _pool_lists(pool)
    for l in range(pool.nlist):
        assert got.get(l, []) == model.get(l, []), f"list {l}"
    if pool.n_rows:
        back = np.asarray(
            pool.gather_rows("rows", np.arange(pool.n_rows))
        )
        np.testing.assert_array_equal(back, rows_np)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def make_pool(nlist=6, chunk_rows=8, mls=None):
    return ChunkPool(
        {"rows": ((4,), np.float32), "sqn": ((), np.float32)},
        nlist, chunk_rows=chunk_rows, max_list_size=mls,
    )


def test_append_and_gather(rng):
    pool = make_pool()
    all_lists, all_rows = [], []
    for nb in (5, 30, 1, 17):
        lists = rng.integers(0, 6, nb).astype(np.int32)
        rows = rng.random((nb, 4), dtype=np.float32)
        pool.append(jnp.asarray(lists), {
            "rows": jnp.asarray(rows),
            "sqn": jnp.asarray((rows ** 2).sum(1)),
        })
        all_lists.append(lists)
        all_rows.append(rows)
    lists_np = np.concatenate(all_lists)
    rows_np = np.concatenate(all_rows)
    assert pool.n_rows == lists_np.shape[0]
    _check_consistency(pool, lists_np, rows_np)


def test_virtual_bucket_views_match_padded_semantics(rng):
    pool = make_pool(nlist=5, chunk_rows=8)
    lists = rng.integers(0, 5, 60).astype(np.int32)
    rows = rng.random((60, 4), dtype=np.float32)
    pool.append(jnp.asarray(lists), {
        "rows": jnp.asarray(rows), "sqn": jnp.asarray((rows ** 2).sum(1)),
    })
    chains_s = pool.chains_search()
    pl = jnp.asarray([0, 3, 4, 2], jnp.int32)
    ids = np.asarray(take_list_ids(pool.slot_ids, chains_s, pl, pool.cap))
    got_rows = np.asarray(take_list_payload(pool.data["rows"], chains_s, pl))
    model = _model_lists(lists)
    for qi, l in enumerate([0, 3, 4, 2]):
        want = model.get(l, [])
        live = ids[qi][ids[qi] >= 0]
        assert live.tolist() == want
        np.testing.assert_array_equal(
            got_rows[qi][ids[qi] >= 0], rows[np.asarray(want, int)]
        )


def test_max_list_size_truncates_search_not_storage(rng):
    pool = make_pool(nlist=3, chunk_rows=8, mls=10)
    lists = np.zeros(40, np.int32)  # all in list 0: 40 > cap
    rows = rng.random((40, 4), dtype=np.float32)
    pool.append(jnp.asarray(lists), {
        "rows": jnp.asarray(rows), "sqn": jnp.asarray((rows ** 2).sum(1)),
    })
    assert pool.cap == 16  # round8(10) -> 16
    ids = np.asarray(take_list_ids(
        pool.slot_ids, pool.chains_search(), jnp.asarray([0]), pool.cap
    ))[0]
    assert (ids >= 0).sum() == 16  # searchable rows capped
    assert int(pool.lens_h[0]) == 40  # but all rows stored


def test_remove_renumbers_and_repacks(rng):
    pool = make_pool(nlist=4, chunk_rows=8)
    lists = rng.integers(0, 4, 50).astype(np.int32)
    rows = rng.random((50, 4), dtype=np.float32)
    pool.append(jnp.asarray(lists), {
        "rows": jnp.asarray(rows), "sqn": jnp.asarray((rows ** 2).sum(1)),
    })
    removed = np.asarray([0, 7, 8, 33, 49])
    keep = np.setdiff1d(np.arange(50), removed)
    pool.remove(removed, lists)
    assert pool.n_rows == 45
    _check_consistency(pool, lists[keep], rows[keep])


def test_remove_then_append_recycles_chunks(rng):
    pool = make_pool(nlist=2, chunk_rows=8)
    lists = np.zeros(64, np.int32)
    rows = rng.random((64, 4), dtype=np.float32)
    pool.append(jnp.asarray(lists), {
        "rows": jnp.asarray(rows), "sqn": jnp.asarray((rows ** 2).sum(1)),
    })
    used_before = pool.stats()["chunks_used"]
    pool.remove(np.arange(32), lists)  # halve list 0
    lists2 = np.ones(16, np.int32)
    rows2 = rng.random((16, 4), dtype=np.float32)
    pool.append(jnp.asarray(lists2), {
        "rows": jnp.asarray(rows2), "sqn": jnp.asarray((rows2 ** 2).sum(1)),
    })
    assert pool.stats()["chunks_used"] <= used_before + 1
    _check_consistency(
        pool,
        np.concatenate([lists[32:], lists2]),
        np.concatenate([rows[32:], rows2]),
    )


def test_relabel_and_rebalance_style_move(rng):
    """The rebalance sequence: gather movers, free their lists, relabel
    ids, re-append under new assignments with unchanged row ids."""
    pool = make_pool(nlist=4, chunk_rows=8)
    lists = np.asarray([0] * 20 + [1] * 3 + [2] * 10 + [3] * 2, np.int32)
    n = lists.shape[0]
    rows = rng.random((n, 4), dtype=np.float32)
    pool.append(jnp.asarray(lists), {
        "rows": jnp.asarray(rows), "sqn": jnp.asarray((rows ** 2).sum(1)),
    })
    # "Split" list 0 into lists {0, new 3}; "retire" list 3 (its rows
    # move to list 1). remap: 0->0, 1->1, 2->2, 3->-1 (retired), new
    # nlist = 4 (slot 3 now the split half).
    movers = np.concatenate([np.where(lists == 0)[0],
                             np.where(lists == 3)[0]])
    movers.sort()
    payloads = {k: pool.gather_rows(k, movers) for k in pool.specs}
    pool.free_lists(np.asarray([0, 3]))
    pool.relabel_lists(np.asarray([0, 1, 2, -1], np.int32), 4)
    new_lists = np.where(movers < 10, 0, np.where(lists[movers] == 3, 1, 3))
    pool.append(jnp.asarray(new_lists.astype(np.int32)), payloads,
                row_ids=jnp.asarray(movers.astype(np.int32)))
    final = lists.copy()
    final[movers] = new_lists
    # order within a list follows append order of the mover batch;
    # non-movers keep original order. Model respects this because movers
    # re-append after survivors.
    model = {}
    for i in np.where(~np.isin(np.arange(n), movers))[0]:
        model.setdefault(int(final[i]), []).append(int(i))
    for i, l in zip(movers, new_lists):
        model.setdefault(int(l), []).append(int(i))
    got = _pool_lists(pool)
    for l in range(4):
        assert got.get(l, []) == model.get(l, []), f"list {l}"
    back = np.asarray(pool.gather_rows("rows", np.arange(n)))
    np.testing.assert_array_equal(back, rows)


def test_reserve_prevents_growth(rng):
    pool = make_pool(nlist=4, chunk_rows=8)
    pool.reserve(200)
    alloc = pool.stats()["chunks_allocated"]
    for _ in range(4):
        lists = rng.integers(0, 4, 50).astype(np.int32)
        rows = rng.random((50, 4), dtype=np.float32)
        pool.append(jnp.asarray(lists), {
            "rows": jnp.asarray(rows),
            "sqn": jnp.asarray((rows ** 2).sum(1)),
        })
    assert pool.stats()["chunks_allocated"] == alloc


def test_random_ops_property(rng):
    """Randomized append/remove interleaving stays consistent."""
    pool = make_pool(nlist=5, chunk_rows=8)
    lists_np = np.zeros((0,), np.int32)
    rows_np = np.zeros((0, 4), np.float32)
    for step in range(12):
        if pool.n_rows > 10 and step % 3 == 2:
            r = rng.choice(pool.n_rows, pool.n_rows // 4, replace=False)
            r.sort()
            keep = np.setdiff1d(np.arange(pool.n_rows), r)
            pool.remove(r, lists_np)
            lists_np, rows_np = lists_np[keep], rows_np[keep]
        else:
            nb = int(rng.integers(1, 40))
            lists = rng.integers(0, 5, nb).astype(np.int32)
            rows = rng.random((nb, 4), dtype=np.float32)
            pool.append(jnp.asarray(lists), {
                "rows": jnp.asarray(rows),
                "sqn": jnp.asarray((rows ** 2).sum(1)),
            })
            lists_np = np.concatenate([lists_np, lists])
            rows_np = np.concatenate([rows_np, rows])
        assert pool.n_rows == lists_np.shape[0]
    _check_consistency(pool, lists_np, rows_np)

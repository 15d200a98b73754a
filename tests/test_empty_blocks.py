"""Regression tests for the BENCH_r04 crash class: Ray Data groupby can
emit a zero-row block whose schema is EMPTY, and every pinned-block
(`to_arrow_refs`) kernel must survive it (VERDICT r4 finding #1).

Each test builds a Dataset that literally contains a ``pa.table({})``
block next to real data (`ray.data.from_arrow` reproduces the hazard
exactly — `select_columns` passes the empty-schema block through
unchanged) and asserts the kernel result is identical to the clean run.
"""

import numpy as np
import pyarrow as pa
import pytest

from nadry_search_engine_be_ray.stages.blocks import block_ok, nonempty_refs


GOOD = pa.table({
    "src": pa.array([0, 1, 2, 0, 1], pa.int64()),
    "dst": pa.array([1, 2, 0, 2, 0], pa.int64()),
})


def _pair(ray):
    """(dataset with an empty-schema block, clean dataset)."""
    import ray.data

    dirty = ray.data.from_arrow([GOOD, pa.table({})])
    clean = ray.data.from_arrow(GOOD)
    return dirty, clean


def test_block_ok():
    assert block_ok(GOOD, "src", "dst")
    assert not block_ok(GOOD, "src", "nope")
    assert not block_ok(pa.table({}), "src")
    assert not block_ok(GOOD.slice(0, 0), "src", "dst")


def test_nonempty_refs_drops_empty_blocks(ray_session):
    import ray

    dirty, _ = _pair(ray)
    refs = nonempty_refs(dirty, ["src", "dst"])
    tables = ray.get(refs)
    assert all(t.num_rows > 0 for t in tables)
    assert sum(t.num_rows for t in tables) == GOOD.num_rows


def test_nonempty_refs_raises_on_missing_column(ray_session):
    import ray
    import ray.data

    ds = ray.data.from_arrow(GOOD)
    with pytest.raises(ValueError, match="missing required column"):
        nonempty_refs(ds, ["src", "no_such_col"])


def test_nonempty_refs_all_empty(ray_session):
    import ray
    import ray.data

    ds = ray.data.from_arrow([pa.table({}), GOOD.slice(0, 0)])
    assert nonempty_refs(ds, ["src", "dst"]) == []


@pytest.mark.parametrize("kernel", ["power", "quirk", "hits", "labelprop"])
def test_int_graph_kernels_survive_empty_schema_block(ray_session, kernel):
    import ray

    from nadry_search_engine_be_ray.pipelines.pagerank import (
        hits_int, label_propagation_min, pagerank_power_int,
        pagerank_quirk_int,
    )

    fns = {
        "power": lambda ds: pagerank_power_int(ds, 3, n_iter=3),
        "quirk": lambda ds: pagerank_quirk_int(ds, 3, n_iter=3),
        "hits": lambda ds: hits_int(ds, 3, n_iter=3),
        "labelprop": lambda ds: label_propagation_min(ds, 3, n_rounds=3),
    }
    dirty, clean = _pair(ray)
    got = fns[kernel](dirty)      # crashed with KeyError before the guard
    want = fns[kernel](clean)
    assert got.equals(want)


def test_distributed_pagerank_survives_empty_schema_block(ray_session):
    import hashlib

    import ray
    import ray.data

    from nadry_search_engine_be_ray.pipelines.pagerank import (
        compute_pagerank_distributed,
    )

    urls = [f"https://ex.com/p{i}" for i in range(4)]
    edges = pa.table({
        "src": pa.array([urls[0], urls[1], urls[2], urls[3]], pa.string()),
        "dst": pa.array([urls[1], urls[2], urls[0], urls[1]], pa.string()),
    })
    doc_ints = np.array(
        [int(hashlib.sha256(u.encode()).hexdigest()[:15], 16) for u in urls],
        dtype=np.int64,
    )
    dirty = ray.data.from_arrow([edges, pa.table({})])
    clean = ray.data.from_arrow(edges)
    got = compute_pagerank_distributed(dirty, doc_ints)
    want = compute_pagerank_distributed(clean, doc_ints)
    assert got.equals(want)
    assert got.num_rows > 0


def test_multi_bfs_rejects_oversized_ids(ray_session):
    """The (seed, node) pair packing is 31+31 bits; ids >= 2^31 must fail
    loudly instead of silently overflowing (ADVICE r4, pagerank.py)."""
    import ray.data

    from nadry_search_engine_be_ray.pipelines.pagerank import (
        multi_bfs_closeness,
    )

    big = np.int64(1) << 32
    edges = pa.table({"src": pa.array([big, big + 1], pa.int64()),
                      "dst": pa.array([big + 1, big + 2], pa.int64())})
    ds = ray.data.from_arrow(edges)
    with pytest.raises(ValueError, match="2\\^31"):
        multi_bfs_closeness(ds, seeds=[int(big)], n_rounds=2)


def test_multi_bfs_large_but_valid_seed(ray_session):
    """Seeds above the OLD broken bound (2^23) but inside the new 31-bit
    bound must produce correct closeness (the silent-corruption case)."""
    import ray.data

    from nadry_search_engine_be_ray.pipelines.pagerank import (
        multi_bfs_closeness,
    )

    base = (1 << 24)  # would have overflowed the old 40-bit node shift
    edges = pa.table({
        "src": pa.array([base, base + 1, base + 2], pa.int64()),
        "dst": pa.array([base + 1, base + 2, base + 3], pa.int64()),
    })
    ds = ray.data.from_arrow(edges)
    out = multi_bfs_closeness(ds, seeds=[base], n_rounds=3)
    row = {c: out[c][0].as_py() for c in out.column_names}
    # path graph: reaches base+1 (d1), base+2 (d2), base+3 (d3)
    assert row["n_reached"] == 4
    assert row["sum_depth"] == 6
    assert row["closeness_micro"] == 3 * 10**6 // 6


def _vec_tables(n=40, dim=8):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(n, dim)).astype(np.float64)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float64())),
        "y": pa.array((np.arange(n) % 2).astype(np.int64), pa.int64()),
    })


def test_lr_fit_survives_empty_schema_block(ray_session):
    import ray.data

    from nadry_search_engine_be_ray.stages.classifier import lr_fit

    tbl = _vec_tables()
    dirty = ray.data.from_arrow([tbl, pa.table({})])
    clean = ray.data.from_arrow(tbl)
    w_d = lr_fit(dirty, label_col="y", n_iters=5, lr=0.5)
    w_c = lr_fit(clean, label_col="y", n_iters=5, lr=0.5)
    np.testing.assert_array_equal(w_d, w_c)


def test_kmeans_fit_survives_empty_schema_block(ray_session):
    import ray.data

    from nadry_search_engine_be_ray.stages.clustering import kmeans_fit

    tbl = _vec_tables()
    dirty = ray.data.from_arrow([tbl, pa.table({})])
    clean = ray.data.from_arrow(tbl)
    c_d, _ = kmeans_fit(dirty, k=4, n_iters=3)
    c_c, _ = kmeans_fit(clean, k=4, n_iters=3)
    np.testing.assert_array_equal(c_d, c_c)


def test_pq_train_survives_empty_schema_block(ray_session):
    import ray.data

    from nadry_search_engine_be_ray.stages.pq import pq_train

    tbl = _vec_tables()
    dirty = ray.data.from_arrow([tbl, pa.table({})])
    clean = ray.data.from_arrow(tbl)
    cb_d, _ = pq_train(dirty, m=2, k=4, n_iters=3)
    cb_c, _ = pq_train(clean, m=2, k=4, n_iters=3)
    np.testing.assert_array_equal(cb_d, cb_c)

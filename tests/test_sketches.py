"""Sketch operators: HLL distinct count and grid quantile sketch must land
within their stated error bounds of the exact answers, and sketches must be
merge-order independent."""

import numpy as np
import pyarrow as pa
import ray.data

from nadry_search_engine_be_ray.stages import sketches

SF = "/root/testdata/sf0.01"


def test_hll_register_update_deterministic():
    v = np.arange(10_000, dtype=np.int64)
    r1 = sketches.hll_update(v)
    r2 = sketches.hll_update(v)
    assert np.array_equal(r1, r2)
    # merge (max) of two halves == sketch of the union
    a = sketches.hll_update(v[:5000])
    b = sketches.hll_update(v[5000:])
    assert np.array_equal(np.maximum(a, b), r1)


def test_hll_distinct_accuracy(ray_session):
    ds = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    import duckdb

    exact = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()[0]
    est = sketches.hll_distinct(ds, "l_orderkey")
    assert abs(est - exact) / exact < 0.05  # 3x the 1.6% sigma


def test_quantile_sketch_accuracy(ray_session):
    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["value"])
    vals = ds.to_pandas()["value"].to_numpy(np.float64)
    lo, hi = float(vals.min()), float(vals.max()) + 1e-9
    est = sketches.quantile_sketch(ds, "value", lo, hi, qs=(0.5, 0.9, 0.99))
    exact = np.percentile(vals, [50, 90, 99])
    width = (hi - lo) / sketches.Q_BINS
    for e, x in zip(est, exact):
        assert abs(e - x) <= 2 * width

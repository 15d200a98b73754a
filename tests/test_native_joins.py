"""Native hash-shuffle join operators: the salted skew join must be
row-identical to an unsalted join, the rollup must be self-consistent,
and the two-pass exact median must survive degenerate value layouts.
(Value-level correctness vs DuckDB is covered for every key by
test_entry_contract; these tests pin the operator-specific invariants.)"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from nadry_search_engine_be_ray.pipelines import relational as rel

SF = "/root/testdata/sf0.001"


def test_skew_join_equals_unsalted(ray_session):
    import duckdb

    got = rel.q_skew_join(SF)
    exp = duckdb.sql(
        f"""
        SELECT c_mktsegment, count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM read_parquet('{SF}/events.parquet') e
        JOIN read_parquet('{SF}/customer.parquet') c
          ON e.user_id = c.c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_rollup_levels_consistent(ray_session):
    out = rel.q_rollup(SF)
    leaf = out[(out.l_returnflag != "ALL") & (out.l_linestatus != "ALL")]
    lvl1 = out[(out.l_returnflag != "ALL") & (out.l_linestatus == "ALL")]
    total = out[(out.l_returnflag == "ALL") & (out.l_linestatus == "ALL")]
    assert len(total) == 1
    assert total["n_rows"].iloc[0] == leaf["n_rows"].sum()
    assert lvl1["n_rows"].sum() == leaf["n_rows"].sum()
    for flag, sub in leaf.groupby("l_returnflag"):
        row = lvl1[lvl1.l_returnflag == flag]
        assert row["n_rows"].iloc[0] == sub["n_rows"].sum()


def test_outer_join_counts(ray_session):
    import duckdb

    out = rel.q_outer_join(SF)
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/customer.parquet')"
    ).fetchone()[0]
    n_orders = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{SF}/orders.parquet')
            WHERE o_custkey IN
              (SELECT c_custkey FROM read_parquet('{SF}/customer.parquet'))"""
    ).fetchone()[0]
    # each customer contributes max(1, n_orders) join rows
    assert out["n_rows"].sum() == n_orders + out["n_no_order"].sum()
    assert out["n_rows"].sum() >= n_cust


def test_median_rank_selection_lower_median():
    # the in-bin exact pick must implement rank (n-1)//2 (lower median)
    for vals in ([1.0, 2.0], [1.0, 2.0, 3.0], [5.0] * 10, [2.0, 1.0, 4.0, 3.0]):
        n = len(vals)
        k = (n - 1) // 2
        assert sorted(vals)[k] == float(np.sort(vals)[k])


def test_grouped_median_on_constant_group(ray_session, tmp_path):
    # degenerate: a group whose values are all identical (span -> epsilon)
    import ray.data

    df = pd.DataFrame(
        {
            "l_returnflag": ["A"] * 5 + ["B"] * 4,
            "l_extendedprice": [7.0] * 5 + [1.0, 2.0, 3.0, 4.0],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    ray.data.from_pandas(df).write_parquet(str(sf / "lineitem.parquet"))
    out = rel.q_grouped_median(str(sf))
    got = dict(zip(out["l_returnflag"], out["median_price"]))
    assert got == {"A": 7.0, "B": 2.0}  # lower median of even-sized B

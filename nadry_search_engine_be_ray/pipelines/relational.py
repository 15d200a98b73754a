"""Relational operator pipelines over the driver testdata tables.

These back the SURVEY.md §2 operator inventory with DuckDB-checkable
results (driver correctness gate): aggregations with map-side partial
aggregation (A1-A3 pattern), broadcast hash join (J3/J4), top-k sort (K1/K3),
distinct (D5/A11), filter+project (M7), and a tumbling-window aggregate over
the events table (the streaming-shaped analog, ray_guide windowing pattern).

Each function takes ``sf_dir`` and returns a small pyarrow/pandas result.
Aggregate float columns are rounded to 4 decimals to make the Ray-vs-DuckDB
value hash insensitive to summation order (both sides round identically;
4 dp keeps the ~1e-8 absolute float noise far from the rounding boundary).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def q_agg_pushdown(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped: per (returnflag, linestatus) sums — with the
    partial-aggregate-before-shuffle pattern: each batch pre-aggregates to
    one row per key, then the groupby shuffles only partials."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            revenue=("revenue", "sum"),
            n_rows=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("revenue", alias_name="revenue"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].round(4)
    out["revenue"] = out["revenue"].round(4)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q_broadcast_join(sf_dir: str) -> pd.DataFrame:
    """Broadcast hash join: orders ⨝ customer (small side ray.put once,
    merged per batch — J3 pattern, no shuffle)."""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    ref = ray.put(cust)

    def join_batch(batch: pa.Table) -> pa.Table:
        small = ray.get(ref)
        df = batch.to_pandas().merge(
            small, left_on="o_custkey", right_on="c_custkey", how="inner"
        )
        return pa.Table.from_pandas(
            df[["c_mktsegment", "o_totalprice"]], preserve_index=False
        )

    joined = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        join_batch, batch_format="pyarrow"
    )
    out = (
        joined.groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("o_totalprice", alias_name="sum_price"),
        )
        .to_pandas()
    )
    out["sum_price"] = out["sum_price"].round(4)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def q_topk(sf_dir: str) -> pd.DataFrame:
    """Global top-10 orders by totalprice (K1/K3: sort desc + limit with
    deterministic orderkey tiebreak)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]) \
        .limit(10).to_pandas()
    out["o_totalprice"] = out["o_totalprice"].round(4)
    return out.reset_index(drop=True)


def q_distinct(sf_dir: str) -> pd.DataFrame:
    """Distinct counting (D5/A11): orders per returnflag, counted once."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_orderkey"])

    def local_distinct(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    # local dedup -> shuffle dedup -> count per flag
    dedup = ds.map_batches(local_distinct, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_orderkey"]) \
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    out = dedup.groupby("l_returnflag").aggregate(Count(alias_name="n_orders")) \
        .to_pandas()
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_filter_project(sf_dir: str) -> pd.DataFrame:
    """Filter + project + global aggregate (M7 pattern), predicate applied
    vectorized inside map_batches."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"],
    )
    cutoff = pa.scalar(np.datetime64("1997-01-01", "us"))

    def fp(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.less(batch["l_shipdate"], cutoff),
            pc.greater(batch["l_quantity"], pa.scalar(25.0)),
        )
        t = batch.filter(mask)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"revenue": rev})

    agg = ds.map_batches(fp, batch_format="pyarrow").aggregate(
        Sum("revenue", alias_name="revenue"), Count(alias_name="n")
    )
    return pd.DataFrame(
        [{"revenue": round(agg["revenue"], 4), "n": int(agg["n"])}]
    )


def q_window(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type over the events table (the
    streaming-shaped workload: window key computed per batch, then one
    groupby — ray_guide 'Streaming-shaped workloads')."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        win = (ts.astype(np.int64) // 3_600_000_000).astype(np.int64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_h": pa.array(win, pa.int64()),
                "value": batch["value"],
            }
        )

    out = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "window_h"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["event_type", "window_h"]).reset_index(drop=True)


def q_three_way_join(sf_dir: str) -> pd.DataFrame:
    """region ⨝ nation ⨝ supplier: chained broadcast joins (all small)."""
    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"]).to_pandas()
    df = supplier.merge(nation, left_on="s_nationkey", right_on="n_nationkey") \
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    out = df.groupby("r_name", as_index=False).agg(
        n_suppliers=("s_suppkey", "size"), sum_acctbal=("s_acctbal", "sum")
    )
    out["sum_acctbal"] = out["sum_acctbal"].round(4)
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return out.sort_values("r_name").reset_index(drop=True)

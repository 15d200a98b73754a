"""Brute-force reference tests for the ordered-scan primitives
(pipelines/scan_ops.py): halo-exchange rolling window, distributed
row_number, and streaming burst-collapse dedup.  Each is recomputed with
an independent single-threaded pandas/numpy reference, and the two
distribution knobs (partition width, fused-part count) are varied to
prove the answers are partitioning-independent — the property the halo
exchange / prefix-sum offsets exist to guarantee."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"])


def test_rolling_halo_matches_single_thread_reference(ray_session):
    from nadry_search_engine_be_ray.pipelines.scan_ops import q_rolling_halo

    out = q_rolling_halo(SF)

    ev = _events().sort_values(["ts", "event_id"]).reset_index(drop=True)
    rm = ev["value"].rolling(5, min_periods=1).mean().round(6)
    ref = (pd.DataFrame({"event_type": ev["event_type"], "rm": rm})
           .groupby("event_type", as_index=False)
           .agg(n=("rm", "count"), sum_rm=("rm", "sum"),
                hi_cnt=("rm", lambda s: int((s > 60.0).sum()))))
    ref["sum_rm"] = ref["sum_rm"].round(4)
    ref[["n", "hi_cnt"]] = ref[["n", "hi_cnt"]].astype("int64")
    pd.testing.assert_frame_equal(
        out, ref.sort_values("event_type").reset_index(drop=True))


def test_rolling_halo_partition_width_independent(ray_session):
    """The halo exchange must make the result independent of how the
    stream is cut: 1-day vs 7-day partitions give identical output."""
    import nadry_search_engine_be_ray.pipelines.scan_ops as so

    orig = so._ts_part
    out3 = so.q_rolling_halo(SF)
    try:
        so._ts_part = lambda b, c, d: orig(b, c, 1)
        out1 = so.q_rolling_halo(SF)
        so._ts_part = lambda b, c, d: orig(b, c, 7)
        out7 = so.q_rolling_halo(SF)
    finally:
        so._ts_part = orig
    pd.testing.assert_frame_equal(out3, out1)
    pd.testing.assert_frame_equal(out3, out7)


def test_dense_ids_contiguous_and_sorted(ray_session):
    from nadry_search_engine_be_ray.pipelines.scan_ops import q_dense_ids

    out = q_dense_ids(SF, every=50, head=10)
    odf = pd.read_parquet(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_orderdate"])
    odf = odf.sort_values(["o_orderdate", "o_orderkey"]).reset_index(
        drop=True)
    odf["rn"] = np.arange(1, len(odf) + 1, dtype=np.int64)
    ref = odf[(odf["rn"] <= 10) | (odf["rn"] % 50 == 0)]
    ref = ref[["rn", "o_orderkey", "o_orderdate"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)


def test_dense_ids_partition_width_independent(ray_session):
    import nadry_search_engine_be_ray.pipelines.scan_ops as so

    orig = so._ts_part
    base = so.q_dense_ids(SF, every=100)
    try:
        so._ts_part = lambda b, c, d: orig(b, c, 365)
        wide = so.q_dense_ids(SF, every=100)
    finally:
        so._ts_part = orig
    pd.testing.assert_frame_equal(base, wide)


def test_stream_dedup_matches_lag_reference(ray_session):
    from nadry_search_engine_be_ray.pipelines.scan_ops import q_stream_dedup

    out = q_stream_dedup(SF, gap_s=10)

    ev = _events().sort_values(
        ["user_id", "event_type", "ts", "event_id"]).reset_index(drop=True)
    prev = ev.groupby(["user_id", "event_type"])["ts"].shift()
    keep = prev.isna() | ((ev["ts"] - prev) > pd.Timedelta(seconds=10))
    df = pd.DataFrame({"event_type": ev["event_type"], "keep": keep,
                       "value": ev["value"]})
    rows = []
    for et, g in df.groupby("event_type"):
        rows.append({
            "event_type": et,
            "kept": int(g["keep"].sum()),
            "dropped": int((~g["keep"]).sum()),
            "kept_value": round(g.loc[g["keep"], "value"].sum(), 4),
        })
    ref = pd.DataFrame(rows)
    ref[["kept", "dropped"]] = ref[["kept", "dropped"]].astype("int64")
    pd.testing.assert_frame_equal(
        out, ref.sort_values("event_type").reset_index(drop=True))


def test_stream_dedup_totals_conserved(ray_session):
    from nadry_search_engine_be_ray.pipelines.scan_ops import q_stream_dedup

    out = q_stream_dedup(SF, gap_s=10)
    ev = _events()
    assert int((out["kept"] + out["dropped"]).sum()) == len(ev)
    # gap so large everything but each group's first row drops
    collapsed = q_stream_dedup(SF, gap_s=10 ** 9)
    groups = ev.groupby(["user_id", "event_type"]).ngroups
    assert int(collapsed["kept"].sum()) == groups

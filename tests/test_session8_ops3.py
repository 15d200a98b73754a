"""Reference tests for session-8 batches I/J: empirical-Bayes smoothing,
survivorship, late-order watermark, changepoint SSE, cardinality
estimation, rendezvous-hashing stability."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_eb_smoothing_shrinks_toward_mean(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_eb_smoothed_rates,
    )

    out = q_eb_smoothed_rates(SF, k=1000)
    raw = out["k"] / out["n"]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    per_user = ev.groupby("user_id").agg(
        n=("event_id", "count"),
        k=("event_type", lambda s: (s == "purchase").sum()))
    m = (per_user["k"] / per_user["n"]).mean()
    # shrinkage: smoothed strictly between the raw rate and the prior
    # mean for every user whose raw rate differs from the mean
    off = np.abs(raw - m) > 1e-9
    assert ((out["smoothed"][off] - raw[off]) * (m - raw[off]) > 0).all()


def test_late_orders_matches_window_reference(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_late_orders,
    )

    got = q_late_orders(SF, n_bins=16)
    got7 = q_late_orders(SF, n_bins=5)
    pd.testing.assert_frame_equal(got, got7)  # bin-count independence
    od = pd.read_parquet(f"{SF}/orders.parquet").sort_values("o_orderkey")
    ts = od["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64)
    prev = np.concatenate(([np.iinfo(np.int64).min], 
                           np.maximum.accumulate(ts)[:-1]))
    late = (prev > np.iinfo(np.int64).min) & (
        ts < prev - 365 * 86_400_000_000)
    yr = (ts[late].astype("datetime64[us]").astype("datetime64[Y]")
          .astype(np.int64) + 1970)
    dv, cnt = np.unique(yr, return_counts=True)
    assert got["o_year"].tolist() == dv.tolist()
    assert got["n_late"].tolist() == cnt.tolist()


def test_changepoint_minimizes_sse(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_changepoint_daily,
    )

    got = q_changepoint_daily(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    for _, row in got.iterrows():
        y = (ev[ev["event_type"] == row["event_type"]]
             .groupby("day").size().sort_index().to_numpy(np.float64))
        best = None
        for k in range(1, y.size):
            l, r = y[:k], y[k:]
            sse = ((l - l.mean()) ** 2).sum() + ((r - r.mean()) ** 2).sum()
            if best is None or sse < best[0] - 1e-9:
                best = (sse, k)
        assert row["split_rn"] == best[1]
        assert abs(row["sse"] - best[0]) < 1e-3


def test_join_cardinality_estimate_reasonable(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_join_cardinality_est,
    )

    out = q_join_cardinality_est(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    od = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    exact = li["l_orderkey"].isin(set(od["o_orderkey"])).sum()
    assert out["exact"][0] == exact
    samp = li["l_orderkey"].isin(
        set(od.loc[od["o_orderkey"] % 20 == 0, "o_orderkey"])).sum()
    assert out["estimated"][0] == 20 * samp


def test_rendezvous_stability_on_node_removal(ray_session):
    """The HRW property: dropping one node remaps ONLY the keys that
    were on it — every other key keeps its assignment."""
    import numpy as np

    M = 2_147_483_647
    n = 8
    j1 = np.arange(1, n + 1, dtype=np.int64)
    a = (2654435761 * j1) % M
    b = (40503 * j1) % M
    ids = np.arange(5000, dtype=np.int64)[:, None]
    hv = (a[None, :] * ids + b[None, :]) % M
    full = np.argmax(hv, axis=1)
    drop = 3
    keep = np.arange(n) != drop
    reduced_idx = np.arange(n)[keep]
    red = reduced_idx[np.argmax(hv[:, keep], axis=1)]
    moved = full != red
    assert (full[moved] == drop).all()
    # and keys on the dropped node all moved somewhere else
    assert (red[full == drop] != drop).all()


def test_golden_records_pick_longest_then_smallest_id(ray_session):
    import re

    from nadry_search_engine_be_ray.pipelines.textqueries import (
        golden_records,
    )

    got = golden_records(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "n_chars"])
    docs["block_key"] = docs["text"].map(
        lambda t: " ".join([x for x in re.split(
            r"[^a-z0-9]+", (t or "").lower()) if x][:2]))
    ref = (docs.sort_values(["block_key", "n_chars", "doc_id"],
                            ascending=[True, False, True])
           .groupby("block_key")
           .agg(golden_doc_id=("doc_id", "first"),
                max_chars=("n_chars", "first"),
                n_members=("doc_id", "count"))
           .reset_index())
    ref = ref[ref["n_members"] >= 2].reset_index(drop=True)
    cast = {c: "int64" for c in
            ("golden_doc_id", "max_chars", "n_members")}
    pd.testing.assert_frame_equal(got.astype(cast), ref.astype(cast))

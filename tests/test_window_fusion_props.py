"""Property tests for the partition-fused per-user window operators:
the per-segment numpy logic must match a straightforward per-user pandas
reference on arbitrary event tables (single user, duplicate timestamps,
empty sides, one-event users)."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

events_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),      # user_id
        st.integers(min_value=0, max_value=10**6),  # ts offset (us)
        st.sampled_from(["click", "view", "purchase"]),
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  width=32),
    ),
    min_size=1,
    max_size=60,
)


def _events_table(rows):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    return pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + np.timedelta64(r[1], "us") for r in rows],
                pa.timestamp("us"),
            ),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
        }
    )


@settings(max_examples=80, deadline=None)
@given(events_st)
def test_fused_running_sum_matches_pandas(rows):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_cumulative_sum,
    )

    # exercise only the batch fn, not the Ray pipeline: pull the inner
    # partition fn via a fake dataset is brittle — instead replicate its
    # exact call path on one partition holding ALL users
    tbl = _events_table(rows).append_column(
        "part", pa.array([0] * len(rows), pa.int64())
    )
    # reference: pandas per-user cumsum in (ts, event_id) order
    df = tbl.to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"])
    ref = df.assign(
        running_value=df.groupby("user_id")["value"].cumsum().round(4)
    )[["event_id", "running_value"]].sort_values("event_id")

    # fused path output (whole table as one partition group)
    import nadry_search_engine_be_ray.pipelines.relational as rel

    fn_cell = {}

    class FakeGrouped:
        def map_groups(self, fn, **kw):
            fn_cell["fn"] = fn
            raise _Stop()

    class FakeDS:
        def map_batches(self, fn, **kw):
            fn_cell["batch"] = fn
            return self

        def groupby(self, key):
            return FakeGrouped()

    class _Stop(Exception):
        pass

    import unittest.mock as mock

    with mock.patch.object(rel, "_read", return_value=FakeDS()):
        try:
            q_cumulative_sum("/nonexistent")
        except _Stop:
            pass
    out = fn_cell["fn"](tbl).to_pandas().sort_values("event_id")
    assert np.allclose(
        out["running_value"].to_numpy(),
        ref["running_value"].to_numpy(),
        atol=1e-9,
    )


@settings(max_examples=80, deadline=None)
@given(events_st)
def test_fused_gaps_match_pandas(rows):
    import unittest.mock as mock

    import nadry_search_engine_be_ray.pipelines.relational as rel

    tbl = _events_table(rows).select(["user_id", "ts"]).append_column(
        "part", pa.array([0] * len(rows), pa.int64())
    )
    fn_cell = {}

    class _Stop(Exception):
        pass

    class FakeGrouped:
        def map_groups(self, fn, **kw):
            fn_cell["fn"] = fn
            raise _Stop()

    class FakeDS:
        def map_batches(self, fn, **kw):
            return self

        def groupby(self, key):
            return FakeGrouped()

    with mock.patch.object(rel, "_read", return_value=FakeDS()):
        try:
            rel.q_event_deltas("/nonexistent")
        except _Stop:
            pass
    out = fn_cell["fn"](tbl).to_pandas().sort_values("user_id")

    df = tbl.to_pandas()
    exp_rows = []
    for uid, g in df.groupby("user_id"):
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]"))
        if len(ts) < 2:
            exp_rows.append((uid, len(ts), None, None))
            continue
        d = np.diff(ts).astype("timedelta64[us]").astype(np.int64) / 1e6
        exp_rows.append(
            (uid, len(ts), round(float(d.mean()), 4),
             round(float(d.max()), 4))
        )
    exp = pd.DataFrame(
        exp_rows, columns=["user_id", "n_events", "mean_gap_s", "max_gap_s"]
    ).sort_values("user_id")
    assert out["n_events"].tolist() == exp["n_events"].tolist()
    for c in ["mean_gap_s", "max_gap_s"]:
        for a, b in zip(out[c], exp[c]):
            if pd.isna(a) and pd.isna(b):
                continue
            assert a == b

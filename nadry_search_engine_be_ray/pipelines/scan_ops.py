"""Ordered-scan distributed primitives (SURVEY §2.9 extensions).

Three operators that share one structural problem Ray Data has no verb
for: a computation over a GLOBALLY ORDERED stream where each row needs
context from its predecessors.  The repo's answer is the same in all
three: partition on a deterministic key derived from the order column
(contiguous time ranges), compute within partitions, and exchange only
the O(window x partitions) boundary state through the driver — never a
full sort-merge of the stream.

- ``q_rolling_halo``   ROWS-frame rolling mean with an exact halo
  exchange: pass 1 collects each partition's last W-1 rows (tiny), the
  driver assembles, for every partition, the true last W-1 rows of ALL
  earlier partitions (robust to empty partitions), pass 2 prepends that
  halo so interior windows are complete.  At 100 TB the halo is
  W x n_partitions rows regardless of data size.
- ``q_dense_ids``      distributed ``row_number()`` (zip-with-index):
  per-partition counts to the driver (O(partitions)), exclusive prefix
  sum broadcast back, local sort + offset.  The classic surrogate-key
  assignment shape — no global sort, one pass.
- ``q_stream_dedup``   streaming burst-collapse dedup: per (user, type)
  consecutive events closer than ``gap_s`` to their predecessor are
  dropped (LAG semantics).  Fused user partitions, one vectorized pass.

The reference engine (nadry) has no ordered-scan operators at all; these
are the training-data-pipeline additions the brief asks for (event-log
hygiene before sessionization / attribution).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .relational import _fused_parts, _read

_DAY_US = 86_400_000_000


def _ts_part(batch: pa.Table, col: str, days_per_part: int) -> pa.Table:
    """Append a contiguous time-range partition id (days since epoch //
    days_per_part) — deterministic, order-preserving partitioning."""
    us = batch[col].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").astype(np.int64)
    part = us // _DAY_US // days_per_part
    return batch.append_column("part", pa.array(part, pa.int64()))


def q_rolling_halo(sf_dir: str, window: int = 5,
                   threshold: float = 60.0) -> pd.DataFrame:
    """Rolling mean over the GLOBAL event stream ordered by
    (ts, event_id), frame = ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW, attributed to the current row's event_type.

    Two-pass halo exchange (exact, not time-approximate): pass 1 ships
    each time partition's last ``window-1`` rows to the driver; the
    driver concatenates tails in partition order so partition p's halo
    is the true last ``window-1`` stream rows before it even when some
    partitions are empty; pass 2 computes the rolling sum per partition
    with the halo prepended and drops the halo rows' outputs.  Ragged
    start (first rows of the stream) averages over the shorter available
    frame, matching SQL window semantics."""
    halo_n = window - 1
    cols = ["ts", "event_id", "event_type", "value"]

    def order_of(t: pa.Table):
        ts = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return ts, eid, np.lexsort((eid, ts))

    def tail_rows(group: pa.Table) -> pa.Table:
        _, _, order = order_of(group)
        return group.take(order[-halo_n:] if len(order) > halo_n else order)

    ds = _read(sf_dir, "events", cols).map_batches(
        lambda b: _ts_part(b, "ts", 3), batch_format="pyarrow")

    # pass 1: O(halo_n x partitions) rows to the driver
    tails = (ds.groupby("part").map_groups(tail_rows, batch_format="pyarrow")
             .to_pandas())
    tails = tails.sort_values(["part", "ts", "event_id"])
    parts = sorted(tails["part"].unique())
    halos: dict[int, pa.Table] = {}
    prev = tails.iloc[0:0]
    for p in parts:
        if len(prev):
            h = prev.tail(halo_n)
            halos[int(p)] = pa.table({
                "ts": pa.array(
                    h["ts"].to_numpy().astype("datetime64[us]"),
                    pa.timestamp("us")),
                "event_id": pa.array(
                    h["event_id"].to_numpy(np.int64), pa.int64()),
                "event_type": pa.array(
                    h["event_type"].astype(str), pa.string()),
                "value": pa.array(
                    h["value"].to_numpy(np.float64), pa.float64()),
            })
        prev = pd.concat([prev, tails[tails["part"] == p]])
    halo_ref = ray.put(halos)

    def rolling_partition(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        halo = ray.get(halo_ref).get(part)
        n_halo = halo.num_rows if halo is not None else 0
        body = group.select(cols)
        t = pa.concat_tables([halo, body]) if n_halo else body
        ts, eid, order = order_of(t)
        val = t["value"].to_numpy(zero_copy_only=False)[order]
        et = t["event_type"].to_numpy(zero_copy_only=False)[order]
        # halo rows sort strictly before body rows (earlier partitions)
        csum = np.concatenate(([0.0], np.cumsum(val)))
        n = len(val)
        # a halo'd partition has complete frames for every body row; the
        # very first stream partition keeps its ragged short SQL frames
        lo = np.maximum(0, np.arange(n) - window + 1)
        rm = (csum[np.arange(n) + 1] - csum[lo]) / (np.arange(n) - lo + 1)
        rm = np.round(rm, 6)[n_halo:]
        et = et[n_halo:]
        keys, inv = np.unique(et, return_inverse=True)
        return pa.table({
            "event_type": pa.array(keys, pa.string()),
            "n": pa.array(np.bincount(inv), pa.int64()),
            "sum_rm": pa.array(
                np.bincount(inv, weights=rm), pa.float64()),
            "hi_cnt": pa.array(
                np.bincount(inv, weights=(rm > threshold)).astype(np.int64),
                pa.int64()),
        })

    out = (ds.groupby("part").map_groups(
        rolling_partition, batch_format="pyarrow").to_pandas()
        .groupby("event_type", as_index=False)
        .agg(n=("n", "sum"), sum_rm=("sum_rm", "sum"),
             hi_cnt=("hi_cnt", "sum")))
    out["sum_rm"] = out["sum_rm"].round(4)
    out[["n", "hi_cnt"]] = out[["n", "hi_cnt"]].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_rolling_band(sf_dir: str, window: int = 20) -> pd.DataFrame:
    """Bollinger-band breakout scan over the GLOBAL event stream ordered
    by (ts, event_id): a row is a breakout when its value leaves the
    trailing ``window``-row mean ± 2σ band.  Same exact two-pass halo
    exchange as q_rolling_halo, but the windowed state is (sum, sum of
    squares) in INTEGER cents, and the 2σ test is cross-multiplied into
    the pure integer comparison

        (w·v − s)² · (w−1)  >  4 · w · (w·ss − s²)

    so no variance ever reaches floating point — the float-parity trap
    of comparing sqrt-based z-scores across engines never arises.  Only
    FULL frames test (the stream's first window-1 rows are skipped,
    matching the SQL count(*)-over-frame filter); emits the breakout
    rows with their window sums."""
    halo_n = window - 1
    cols = ["ts", "event_id", "value"]

    def order_of(t: pa.Table):
        ts = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return ts, eid, np.lexsort((eid, ts))

    def tail_rows(group: pa.Table) -> pa.Table:
        _, _, order = order_of(group)
        return group.take(order[-halo_n:] if len(order) > halo_n else order)

    ds = _read(sf_dir, "events", cols).map_batches(
        lambda b: _ts_part(b, "ts", 3), batch_format="pyarrow")

    tails = (ds.groupby("part").map_groups(tail_rows, batch_format="pyarrow")
             .to_pandas())
    tails = tails.sort_values(["part", "ts", "event_id"])
    parts = sorted(tails["part"].unique())
    halos: dict[int, pa.Table] = {}
    prev = tails.iloc[0:0]
    for p in parts:
        if len(prev):
            h = prev.tail(halo_n)
            halos[int(p)] = pa.table({
                "ts": pa.array(
                    h["ts"].to_numpy().astype("datetime64[us]"),
                    pa.timestamp("us")),
                "event_id": pa.array(
                    h["event_id"].to_numpy(np.int64), pa.int64()),
                "value": pa.array(
                    h["value"].to_numpy(np.float64), pa.float64()),
            })
        prev = pd.concat([prev, tails[tails["part"] == p]])
    halo_ref = ray.put(halos)

    def band_partition(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        halo = ray.get(halo_ref).get(part)
        n_halo = halo.num_rows if halo is not None else 0
        body = group.select(cols)
        t = pa.concat_tables([halo, body]) if n_halo else body
        _, eid, order = order_of(t)
        v = np.round(t["value"].to_numpy(zero_copy_only=False)[order]
                     * 100).astype(np.int64)
        eid = eid[order]
        cs = np.concatenate(([0], np.cumsum(v)))
        cs2 = np.concatenate(([0], np.cumsum(v * v)))
        n = v.size
        idx = np.arange(n)
        # full frames only (the first stream partition's ragged head is
        # skipped here exactly like the oracle's count(*)-filter)
        full = idx >= window - 1
        full[:n_halo] = False  # halo rows belong to earlier partitions
        s = cs[idx + 1] - cs[np.maximum(idx - window + 1, 0)]
        ss = cs2[idx + 1] - cs2[np.maximum(idx - window + 1, 0)]
        w = np.int64(window)
        dev = w * v - s
        hit = full & (dev * dev * (w - 1) > 4 * w * (w * ss - s * s))
        return pa.table({
            "event_id": pa.array(eid[hit], pa.int64()),
            "v_cents": pa.array(v[hit], pa.int64()),
            "win_sum": pa.array(s[hit], pa.int64()),
            "win_sumsq": pa.array(ss[hit], pa.int64()),
        })

    out = (ds.groupby("part").map_groups(
        band_partition, batch_format="pyarrow").to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_dense_ids(sf_dir: str, every: int = 500, head: int = 10) -> pd.DataFrame:
    """Distributed ``row_number() OVER (ORDER BY o_orderdate, o_orderkey)``
    without a global sort: contiguous date-range partitions count their
    rows (pass 1, O(partitions) to the driver), an exclusive prefix sum
    of those counts is broadcast back, and pass 2 locally sorts each
    partition and adds its offset.  Emits the head rows plus every
    ``every``-th row as checkpoints so the full id assignment is
    hash-checked without shipping every row."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: _ts_part(b, "o_orderdate", 60), batch_format="pyarrow")

    def part_count(group: pa.Table) -> pa.Table:
        return pa.table({
            "part": pa.array([group["part"][0].as_py()], pa.int64()),
            "cnt": pa.array([group.num_rows], pa.int64()),
        })

    counts = (ds.groupby("part").map_groups(
        part_count, batch_format="pyarrow").to_pandas()
        .sort_values("part").reset_index(drop=True))
    offs = dict(zip(
        counts["part"].astype(int),
        np.concatenate(([0], np.cumsum(counts["cnt"].to_numpy())[:-1]))
        .astype(int),
    ))
    offs_ref = ray.put(offs)

    def number_partition(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        off = ray.get(offs_ref)[part]
        dt = group["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        ok = group["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        order = np.lexsort((ok, dt))
        rn = off + 1 + np.arange(len(order), dtype=np.int64)
        keep = (rn <= head) | (rn % every == 0)
        return pa.table({
            "rn": pa.array(rn[keep], pa.int64()),
            "o_orderkey": pa.array(ok[order][keep], pa.int64()),
            "o_orderdate": pa.array(
                dt[order][keep].astype("datetime64[us]"),
                pa.timestamp("us")),
        })

    out = (ds.groupby("part").map_groups(
        number_partition, batch_format="pyarrow").to_pandas())
    return out.sort_values("rn").reset_index(drop=True)


def q_stream_dedup(sf_dir: str, gap_s: int = 10) -> pd.DataFrame:
    """Streaming burst-collapse dedup: within (user_id, event_type), an
    event arriving within ``gap_s`` of its PREDECESSOR (LAG semantics —
    gap measured to the previous raw row, so a long burst collapses to
    its first event only if every inter-arrival is short) is a
    duplicate.  Per event_type: kept / dropped counts and the kept-value
    sum — the idempotency-window hygiene pass a training-data event log
    gets before sessionization.  Fused user partitions, one vectorized
    pass, exact integer-microsecond comparisons."""
    n_parts = _fused_parts(sf_dir, "events")
    gap_us = np.int64(gap_s * 1_000_000)

    def dedup_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        val = group["value"].to_numpy(zero_copy_only=False)
        et = group["event_type"].to_numpy(zero_copy_only=False)
        tcode, tinv = np.unique(et, return_inverse=True)
        order = np.lexsort((eid, ts, tinv, uid))
        uid, ts, val, tinv = uid[order], ts[order], val[order], tinv[order]
        keep = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            keep[1:] = (
                (uid[1:] != uid[:-1])
                | (tinv[1:] != tinv[:-1])
                | (ts[1:] - ts[:-1] > gap_us)
            )
        k = len(tcode)
        kept = np.bincount(tinv[keep], minlength=k)
        total = np.bincount(tinv, minlength=k)
        ksum = np.bincount(tinv[keep], weights=val[keep], minlength=k)
        return pa.table({
            "event_type": pa.array(tcode, pa.string()),
            "kept": pa.array(kept.astype(np.int64), pa.int64()),
            "dropped": pa.array((total - kept).astype(np.int64), pa.int64()),
            "kept_value": pa.array(ksum, pa.float64()),
        })

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])
    ds = ds.map_batches(
        lambda b: b.append_column(
            "part",
            pa.array(
                b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                % n_parts, pa.int64())),
        batch_format="pyarrow")
    out = (ds.groupby("part").map_groups(
        dedup_partition, batch_format="pyarrow").to_pandas()
        .groupby("event_type", as_index=False)
        .agg(kept=("kept", "sum"), dropped=("dropped", "sum"),
             kept_value=("kept_value", "sum")))
    out["kept_value"] = out["kept_value"].round(4)
    out[["kept", "dropped"]] = out[["kept", "dropped"]].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)

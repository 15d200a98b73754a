"""Brute-force reference tests for the second session-9 wave: Katz
centrality, partition checksums, winsorized mean, compaction planning,
rolling-median despiking, clamped balance scan, Theil-Sen slope,
delta-of-delta codec bits, feature hashing, Kleinberg burst detection,
zone-map pruning and front-coded dictionaries."""

import hashlib

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_katz_matches_dense_iteration(ray_session):
    import __ray_entry__ as e

    out = e._q_katz(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    n = len(docs)
    A = np.zeros((n, n))
    for d in docs["doc_id"].astype(int):
        for k in (1, 2, 3):
            dst = (d * d * 31 + k * 97) % n
            if dst != d:
                A[d, dst] = 1.0
    v = np.ones(n)
    for _ in range(6):
        v = 1.0 + 0.05 * (A.T @ v)
    ref = pd.DataFrame({"node": np.arange(n), "katz": np.round(v, 6)})
    ref = ref.sort_values(["katz", "node"], ascending=[False, True]).head(20)
    assert out["node"].tolist() == ref["node"].tolist()
    assert np.allclose(out["katz"], ref["katz"], atol=1e-6)


def test_partition_checksums_match_hashlib(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_partition_checksums,
    )

    out = q_partition_checksums(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    assert int(out["n_rows"].sum()) == len(ev)
    for _, row in out.head(3).iterrows():
        g = ev[ev["day"] == row["day"]].sort_values("event_id")
        lines = "\n".join(
            f"{int(r.event_id)}|{int(r.user_id)}|{r.event_type}|"
            f"{int(r.ts.value // 1000)}|{int(round(r.value * 100))}"
            for r in g.itertuples())
        assert row["sha"] == hashlib.sha256(lines.encode()).hexdigest()
        assert row["n_rows"] == len(g)


def test_winsorized_mean_bounds(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_winsorized_mean,
    )

    out = q_winsorized_mean(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    for _, row in out.iterrows():
        v = np.sort(ev[ev["event_type"] == row["event_type"]]
                    ["value"].to_numpy())
        n = v.size
        p_lo = v[int(np.ceil(0.05 * n)) - 1]
        p_hi = v[int(np.ceil(0.95 * n)) - 1]
        w = np.clip(v, p_lo, p_hi)
        assert row["p_lo"] == pytest.approx(p_lo, abs=1e-6)
        assert row["p_hi"] == pytest.approx(p_hi, abs=1e-6)
        assert row["mean_winsorized"] == pytest.approx(w.mean(), abs=1e-5)
        assert row["n_clipped"] == int(((v < p_lo) | (v > p_hi)).sum())
        # winsorizing pulls the mean toward the center, never outside
        assert p_lo <= row["mean_winsorized"] <= p_hi


def test_compaction_plan_invariants(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_compaction_plan,
    )

    out = q_compaction_plan(SF, capacity=120)
    # bins are contiguous, 1-based, monotone over days
    assert out["bin"].iloc[0] == 1
    assert (out["bin"].diff().dropna().isin([0, 1])).all()
    fills = out.groupby("bin")["n"].sum()
    # a bin only exceeds capacity if a single oversized file owns it
    for b, f in fills.items():
        if f > 120:
            assert (out[out["bin"] == b]["n"] > 120).any()
    # bin_fill is the running fill and ends each bin at its total
    last = out.groupby("bin").tail(1).set_index("bin")["bin_fill"]
    pd.testing.assert_series_equal(last, fills, check_names=False)


def test_rolling_median_window_reference(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_rolling_median_smooth,
    )

    out = q_rolling_median_smooth(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"])
    ev["day"] = ev["ts"].dt.floor("D")
    daily = (ev.groupby(["event_type", "day"])["value"].mean()
             .round(6).reset_index(name="m"))
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        mi = np.round(g["m"].to_numpy() * 1e6).astype(np.int64)
        sub = out[out["event_type"] == et].reset_index(drop=True)
        for i in range(len(g)):
            w = mi[max(0, i - 3): i + 4]
            assert sub["med2_micro"].iloc[i] == int(round(
                2 * float(np.median(w))))


def test_clamped_balance_sequential_reference(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_clamped_balance,
    )

    out = q_clamped_balance(SF, top=1000)
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"])
    for _, row in out.iterrows():
        g = ev[ev["user_id"] == row["user_id"]]
        bal, clamps = 0, 0
        for r in g.itertuples():
            c = int(round(r.value * 100))
            bal += c if r.event_type == "purchase" else -c
            if bal < 0:
                bal, clamps = 0, clamps + 1
        assert (row["balance_cents"], row["n_clamps"]) == (bal, clamps)


def test_theil_sen_median_of_slopes(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import q_theil_sen

    out = q_theil_sen(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"])
    ev["day"] = ev["ts"].dt.floor("D")
    daily = (ev.groupby(["event_type", "day"])["value"].mean()
             .round(6).reset_index(name="m"))
    for _, row in out.iterrows():
        g = daily[daily["event_type"] == row["event_type"]].sort_values(
            "day")
        mi = np.round(g["m"].to_numpy() * 1e6).astype(np.int64)
        sl = [(mi[j] - mi[i]) / (j - i)
              for i in range(len(mi)) for j in range(i + 1, len(mi))]
        assert row["n_pairs"] == len(sl)
        assert row["slope2_micro"] == pytest.approx(
            2 * float(np.median(sl)), abs=1e-6)


def test_ts_dod_bits_small_reference(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_ts_dod_bits,
        _bit_length,
    )

    # _bit_length vs int.bit_length
    z = np.array([0, 1, 2, 3, 4, 255, 256, 2 ** 40, 2 ** 52 - 1], np.int64)
    assert [int(x) for x in _bit_length(z)] == [
        max(1, int(x).bit_length()) for x in z]

    out = q_ts_dod_bits(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    u = out["user_id"].iloc[0]
    t = (ev[ev["user_id"] == u].sort_values(["ts", "event_id"])["ts"]
         .to_numpy().astype("datetime64[us]").astype(np.int64))
    deltas = np.diff(t)
    stream = np.concatenate(([deltas[0]], np.diff(deltas)))
    bits = 64
    for x in stream:
        zz = 2 * x if x >= 0 else -2 * x - 1
        bits += max(1, int(zz).bit_length()) + 6
    assert out[out["user_id"] == u]["dod_bits"].iloc[0] == bits
    assert (out["dod_bits"] < 64 * out["n_events"]).all()  # it compresses


def test_kleinberg_burst_reference(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_kleinberg_burst,
    )

    out = q_kleinberg_burst(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts"])
    ev["day"] = ev["ts"].dt.floor("D")
    for _, row in out.iterrows():
        y = (ev[ev["event_type"] == row["event_type"]]
             .groupby("day").size().sort_index().to_numpy(float))
        p0 = y.sum() / y.size
        p1 = 2 * p0
        c0, c1, bd = 0.0, 1.0, 0
        for t in range(y.size):
            n0 = min(c0, c1) + (p0 - y[t] * np.log(p0))
            n1 = min(c0 + 1.0, c1) + (p1 - y[t] * np.log(p1))
            c0, c1 = n0, n1
            bd += c1 < c0
        assert row["cost_base"] == pytest.approx(c0, abs=1e-5)
        assert row["cost_burst"] == pytest.approx(c1, abs=1e-5)
        assert row["burst_days"] == bd


def test_zone_map_prune_mix(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_zone_map_prune,
    )

    out = q_zone_map_prune(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    assert int(out["n"].sum()) == len(ev)
    # the clustered layout must produce BOTH prunable and kept buckets
    assert out["prunable"].any() and (~out["prunable"]).any()
    for _, row in out.iterrows():
        v = ev[np.floor(ev["value"] / 50.0) == row["val_bucket"]]["value"]
        assert row["min_v"] == pytest.approx(v.min(), abs=1e-6)
        assert row["max_v"] == pytest.approx(v.max(), abs=1e-6)


def test_frontcode_roundtrip_bytes(ray_session):
    from nadry_search_engine_be_ray.pipelines.textqueries import (
        term_dict_frontcode,
    )

    out = term_dict_frontcode(SF)
    # independent scalar recomputation over the same vocabulary
    import re
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    vocab = sorted({t for txt in docs["text"]
                    for t in re.split("[^a-z0-9]+", txt.lower())
                    if len(t) >= 2})
    by_head: dict[str, list[str]] = {}
    for t in vocab:
        by_head.setdefault(t[0], []).append(t)
    for _, row in out.iterrows():
        terms = by_head[row["head"]]
        raw = sum(len(t) + 1 for t in terms)
        fc = len(terms[0]) + 1
        for a, b in zip(terms, terms[1:]):
            cpl = 0
            while cpl < min(len(a), len(b)) and a[cpl] == b[cpl]:
                cpl += 1
            fc += 2 + len(b) - cpl
        assert (row["n_terms"], row["raw_bytes"], row["fc_bytes"]) == (
            len(terms), raw, fc)
    # front coding never loses to raw + its ratio is what we report
    assert (out["fc_bytes"] <= out["raw_bytes"] + 1).all()


def test_feature_hashing_totals(ray_session):
    from nadry_search_engine_be_ray.pipelines.textqueries import (
        feature_hashing_stats,
    )

    out = feature_hashing_stats(SF)
    import re
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    vocab = {t for txt in docs["text"]
             for t in re.split("[^a-z0-9]+", txt.lower()) if len(t) >= 2}
    assert (out["total_terms"] == len(vocab)).all()
    buckets = {}
    for t in vocab:
        b = int(hashlib.sha256(t.encode()).hexdigest()[:8], 16) % 4096
        buckets[b] = buckets.get(b, 0) + 1
    top = sorted(buckets.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert list(zip(out["bucket"], out["n_terms"])) == top

"""Brute-force reference tests for the quantitative-analytics family
(pipelines/quant_ops): drawdown prefix scan, VWAP floor division, ANOVA
sums-of-squares decomposition, histogram-ranked MAD / interpolated
percentiles, dictionary-encoding size model, misclassification-count
decision stump and the banded double-billing self-join.  Each pins the
distributed implementation against an independent little-python
recomputation over the raw parquet (the driver's DuckDB oracles
hash-check the same keys at sf0.01)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _events():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def _orders():
    return pq.read_table(f"{SF}/orders.parquet").to_pandas()


def test_max_drawdown_prefix_scan(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import q_max_drawdown

    out = q_max_drawdown(SF)
    o = _orders()
    o["day"] = o["o_orderdate"].dt.floor("D")
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    daily = o.groupby("day")["cents"].sum().sort_index()
    peak = daily.cummax()
    assert out["day"].tolist() == list(daily.index)
    assert out["v_cents"].tolist() == daily.tolist()
    assert out["peak_cents"].tolist() == peak.tolist()
    assert (out["dd_cents"] == out["peak_cents"] - out["v_cents"]).all()
    assert (out["dd_cents"] >= 0).all()
    # the max drawdown itself is consistent with a brute double loop
    v = daily.to_numpy()
    brute = max(int(v[:i + 1].max() - v[i]) for i in range(len(v)))
    assert int(out["dd_cents"].max()) == brute


def test_vwap_floor_division(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import q_vwap_daily

    out = q_vwap_daily(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_shipdate", "l_extendedprice", "l_quantity"]).to_pandas()
    li["day"] = li["l_shipdate"].dt.floor("D")
    li["pv"] = (np.round(li["l_extendedprice"] * 100).astype(np.int64)
                * np.round(li["l_quantity"]).astype(np.int64))
    li["q"] = np.round(li["l_quantity"]).astype(np.int64)
    g = li.groupby("day")[["pv", "q"]].sum().sort_index()
    assert out["pv_cents"].tolist() == g["pv"].tolist()
    assert out["q_units"].tolist() == g["q"].tolist()
    # exact integer floor of the true rational VWAP in micro-dollars
    for pv, q, m in zip(g["pv"], g["q"], out["vwap_micro"]):
        assert int(m) == (int(pv) * 10000) // int(q)


def test_anova_f_against_direct_decomposition(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import q_anova_f

    out = q_anova_f(SF)
    ev = _events()
    cents = np.round(ev["value"] * 100).astype(np.int64)
    groups = [cents[ev["event_type"] == t].to_numpy()
              for t in sorted(ev["event_type"].unique())]
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert int(out["k"][0]) == k and int(out["n"][0]) == n
    assert float(out["f_stat"][0]) == pytest.approx(round(f_ref, 4),
                                                    abs=1e-9)


def test_mad_doubled_integers_match_numpy(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import q_mad_outliers

    out = q_mad_outliers(SF).set_index("event_type")
    ev = _events()
    for t, sub in ev.groupby("event_type"):
        c = np.round(sub["value"] * 100).astype(np.int64).to_numpy()
        med = np.median(c)
        assert int(out.loc[t, "med_x2_cents"]) == int(round(2 * med))
        d2 = np.abs(2 * c - int(round(2 * med)))
        assert int(out.loc[t, "mad_x4_cents"]) == int(round(2 * np.median(d2)))
        mad4 = int(out.loc[t, "mad_x4_cents"])
        assert int(out.loc[t, "n_outliers"]) == int((4 * d2 > 3 * mad4).sum())
        assert int(out.loc[t, "n"]) == len(c)


def test_percentile_x4_matches_numpy_linear(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import (
        q_percentile_interp,
    )

    out = q_percentile_interp(SF).set_index("event_type")
    ev = _events()
    for t, sub in ev.groupby("event_type"):
        c = np.round(sub["value"] * 100).astype(np.int64).to_numpy()
        for q, col in [(25, "p25_x4_cents"), (50, "p50_x4_cents"),
                       (75, "p75_x4_cents")]:
            ref = np.percentile(c, q, method="linear")
            assert abs(int(out.loc[t, col]) / 4.0 - ref) < 1e-9, (t, q)


def test_dict_encoding_formula(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import (
        _DICT_COLS,
        q_dict_encoding_profile,
    )

    out = q_dict_encoding_profile(SF).set_index(["tbl", "col"])
    for tbl, col in _DICT_COLS:
        s = pq.read_table(f"{SF}/{tbl}.parquet", columns=[col]).to_pandas()[col]
        n, card = len(s), s.nunique()
        plain = int(s.str.len().sum())  # ASCII corpus: chars == bytes
        w = (card - 1).bit_length() if card > 1 else 0
        dict_bytes = int(s.drop_duplicates().str.len().sum()) + (n * w + 7) // 8
        row = out.loc[(tbl, col)]
        assert (int(row["n"]), int(row["card"])) == (n, card)
        assert int(row["plain_bytes"]) == plain
        assert int(row["dict_bytes"]) == dict_bytes


def test_decision_stump_brute_force(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import q_decision_stump

    out = q_decision_stump(SF)
    o = _orders()
    thr = np.floor(o["o_totalprice"] / 1000.0).astype(np.int64)
    pos = (o["o_orderstatus"] == "F").astype(np.int64)
    n, p_tot = len(o), int(pos.sum())
    best = None
    for t in sorted(thr.unique()):
        left = thr <= t
        pl, nl = int(pos[left].sum()), int(left.sum())
        pr, nr = p_tot - pl, (n - nl) - (p_tot - pl)
        err = min(pl, nl - pl) + min(pr, nr)
        row = out[out["thr"] == t].iloc[0]
        assert (int(row["n_left"]), int(row["pos_left"]),
                int(row["errors"])) == (nl, pl, err)
        if best is None or err < best[0]:
            best = (err, t)
    marked = out[out["is_best"]]
    assert len(marked) == 1
    assert (int(marked["errors"].iloc[0]),
            int(marked["thr"].iloc[0])) == best


def test_double_billing_brute_pairs(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import q_double_billing

    out = q_double_billing(SF)
    o = _orders()
    o["day"] = (o["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    ref = set()
    gaps = {}
    for _, grp in o.groupby("o_custkey"):
        rows = grp[["o_orderkey", "day", "cents"]].to_numpy()
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if abs(int(rows[i][1] - rows[j][1])) <= 7:
                    k1, k2 = sorted((int(rows[i][0]), int(rows[j][0])))
                    ref.add(k1 * 10**9 + k2)
                    gaps[(k1, k2)] = (
                        abs(int(rows[i][1] - rows[j][1])),
                        abs(int(rows[i][2] - rows[j][2])))
    got = set(out["k1"].to_numpy(np.int64) * 10**9
              + out["k2"].to_numpy(np.int64))
    assert got == ref and len(out) == len(ref)
    for _, r in out.iterrows():
        g, pdiff = gaps[(int(r["k1"]), int(r["k2"]))]
        assert (int(r["gap_days"]), int(r["price_diff_cents"])) == (g, pdiff)


def test_sprt_latch_and_llr(ray_session):
    """The decided column must be the latched prefix-OR of threshold
    crossings, and the llr the Wald statistic of the cumulative
    counts."""
    from nadry_search_engine_be_ray.pipelines.quant_ops import (
        q_sprt_decision,
    )

    out = q_sprt_decision(SF)
    n = out["n_cum"].to_numpy(np.int64)
    k = out["k_cum"].to_numpy(np.int64)
    assert (np.diff(n) > 0).all()
    llr = k * np.log(0.25 / 0.15) + (n - k) * np.log(0.75 / 0.85)
    assert np.allclose(out["llr"], np.round(llr, 6), atol=1e-9)
    crossed = (llr >= np.log(19.0)) | (llr <= -np.log(19.0))
    assert out["decided"].tolist() == list(
        np.maximum.accumulate(crossed.astype(int)) > 0)


def test_cohort_ltv_brute(ray_session):
    import pyarrow.parquet as pq

    from nadry_search_engine_be_ray.pipelines.quant_ops import q_cohort_ltv

    out = q_cohort_ltv(SF)
    o = _orders()
    o["m"] = o["o_orderdate"].dt.to_period("M")
    first = o.groupby("o_custkey")["m"].min()
    o["cohort"] = o["o_custkey"].map(first)
    o["age"] = (o["m"] - o["cohort"]).apply(lambda d: d.n)
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    ref = (o.groupby(["cohort", "age"])["cents"].sum().reset_index()
           .sort_values(["cohort", "age"]))
    assert len(out) == len(ref)
    assert out["rev"].tolist() == ref["cents"].tolist()
    assert out["age"].tolist() == ref["age"].tolist()
    # cum is the per-cohort prefix sum; cohort size matches first-order
    sizes = first.value_counts()
    got_sizes = out.drop_duplicates("cohort").set_index("cohort")
    for coh, row in got_sizes.iterrows():
        assert int(row["n_customers"]) == int(
            sizes[pd.Period(coh, freq="M")])
    cum = out.groupby("cohort")["rev"].cumsum()
    assert out["cum_rev"].tolist() == cum.tolist()


def test_lorenz_exact_deciles(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import q_lorenz_curve

    out = q_lorenz_curve(SF)
    o = _orders()
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    per = (o.groupby("o_custkey")["cents"].sum()
           .reset_index().sort_values(["cents", "o_custkey"]))
    v = per["cents"].to_numpy(np.int64)
    cum = np.concatenate(([0], np.cumsum(v)))
    n, total = len(v), int(v.sum())
    for _, row in out.iterrows():
        r = n * int(row["decile"]) // 10
        assert int(row["cum_users"]) == r
        assert int(row["cum_cents"]) == int(cum[r])
        assert int(row["share_micro"]) == int(cum[r]) * 10**6 // total
    assert int(out["share_micro"].iloc[-1]) == 10**6
    # Lorenz curve is convex: shares grow at most as fast as user share
    assert (np.diff(out["share_micro"].to_numpy()) >= 0).all()


def test_proration_conserves_and_matches_brute(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import (
        _PRORATION_SPAN,
        q_revenue_proration,
    )

    out = q_revenue_proration(SF)
    o = _orders()
    cents = np.round(o["o_totalprice"] * 100).astype(np.int64)
    assert int(out["rec_cents"].sum()) == int(cents.sum())  # conservation
    ref = {}
    for d0, c, p in zip(o["o_orderdate"].dt.floor("D"), cents,
                        o["o_orderpriority"]):
        span = _PRORATION_SPAN[p]
        per, rem = int(c) // span, int(c) % span
        for off in range(span):
            day = d0 + pd.Timedelta(days=off)
            ref[day] = ref.get(day, 0) + per + (rem if off == 0 else 0)
    got = dict(zip(out["day"], out["rec_cents"].astype(int)))
    assert got == ref


def test_skew_audit_brute(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import q_skew_audit

    out = q_skew_audit(SF).set_index("key")
    o = _orders()
    keys = {
        "o_custkey": o["o_custkey"].to_numpy(np.int64) % 64,
        "o_orderkey": o["o_orderkey"].to_numpy(np.int64) % 64,
        "day": (o["o_orderdate"].to_numpy().astype("datetime64[D]")
                .astype(np.int64)) % 64,
        "priority_code": o["o_orderpriority"].str[0].astype(np.int64) % 64,
    }
    for name, b in keys.items():
        c = np.bincount(b)
        c = c[c > 0]
        row = out.loc[name]
        assert int(row["n"]) == len(b)
        assert int(row["nonempty"]) == len(c)
        assert (int(row["min_rows"]), int(row["max_rows"])) == (
            int(c.min()), int(c.max()))
        assert int(row["imbalance_micro"]) == int(c.max()) * 64 * 10**6 \
            // len(b)
    # the categorical key must read as the skew case it exists to show
    assert (out.loc["priority_code", "imbalance_micro"]
            > 5 * out.loc["o_orderkey", "imbalance_micro"])


def test_window_ratios_peer_rule(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import q_window_ratios

    out = q_window_ratios(SF)
    ev = _events()
    ev["day"] = ev["ts"].dt.floor("D")
    ev["cents"] = np.round(ev["value"] * 100).astype(np.int64)
    daily = (ev.groupby(["event_type", "day"])["cents"].sum()
             .reset_index())
    for (et, day), sub in out.groupby(["event_type", "day"]):
        grp = daily[daily["event_type"] == et]
        v = int(daily[(daily["event_type"] == et)
                      & (daily["day"] == day)]["cents"].iloc[0])
        n = len(grp)
        le = int((grp["cents"] <= v).sum())
        row = sub.iloc[0]
        assert int(row["v_cents"]) == v
        assert int(row["cd_micro"]) == le * 10**6 // n
        assert int(row["pct_micro"]) == v * 10**6 // int(
            grp["cents"].sum())


def test_interarrival_brute(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import (
        q_interarrival_stats,
    )

    out = q_interarrival_stats(SF).set_index("event_type")
    ev = _events().sort_values(["user_id", "event_type", "ts", "event_id"])
    us = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    gaps = {}
    prev_key, prev_us = None, None
    for (u, t), usv in zip(zip(ev["user_id"], ev["event_type"]), us):
        if (u, t) == prev_key:
            gaps.setdefault(t, []).append((usv - prev_us) // 60_000_000)
        prev_key, prev_us = (u, t), usv
    for t, g in gaps.items():
        g = np.sort(np.array(g, np.int64))
        n = len(g)
        row = out.loc[t]
        assert int(row["n_gaps"]) == n
        assert int(row["sum_min"]) == int(g.sum())
        assert int(row["med_x2_min"]) == int(g[(n - 1) // 2] + g[n // 2])
        assert int(row["p90_min"]) == int(g[(n - 1) * 9 // 10])
        assert int(row["max_min"]) == int(g.max())


def test_grouping_sets_fold_consistency(ray_session):
    from nadry_search_engine_be_ray.pipelines.quant_ops import (
        q_grouping_sets,
    )

    out = q_grouping_sets(SF)
    fine = out[out["set_id"] == 3]
    by_t = out[out["set_id"] == 1].set_index("event_type")
    by_d = out[out["set_id"] == 2].set_index("dow")
    allr = out[out["set_id"] == 0].iloc[0]
    assert int(allr["n"]) == int(fine["n"].sum())
    assert int(allr["v"]) == int(fine["v"].sum())
    for t, sub in fine.groupby("event_type"):
        assert int(by_t.loc[t, "n"]) == int(sub["n"].sum())
        assert int(by_t.loc[t, "v"]) == int(sub["v"].sum())
    for d, sub in fine.groupby("dow"):
        assert int(by_d.loc[d, "n"]) == int(sub["n"].sum())
        assert int(by_d.loc[d, "v"]) == int(sub["v"].sum())
    ev = _events()
    assert int(allr["n"]) == len(ev)


def test_tree_depth2_brute(ray_session):
    """Exhaustive little-python search over (t1, d2_left, d2_right)."""
    from nadry_search_engine_be_ray.pipelines.quant_ops import q_tree_depth2

    out = q_tree_depth2(SF).iloc[0]
    o = _orders()
    thr = np.floor(o["o_totalprice"] / 1000.0).astype(np.int64).to_numpy()
    dow = (o["o_orderdate"].to_numpy().astype("datetime64[D]")
           .astype(np.int64)) % 7
    lab = (o["o_orderstatus"] == "F").to_numpy()

    def side_err(mask):
        best, bd = None, None
        for d2 in range(7):
            left = mask & (dow <= d2)
            right = mask & ~(dow <= d2)
            e = (min(int(lab[left].sum()), int((~lab[left]).sum()))
                 + min(int(lab[right].sum()), int((~lab[right]).sum())))
            if best is None or e < best:
                best, bd = e, d2
        return best, bd

    best = None
    for t1 in sorted(set(thr.tolist())):
        l_err, l_d2 = side_err(thr <= t1)
        r_err, r_d2 = side_err(thr > t1)
        tot = l_err + r_err
        if best is None or tot < best[0]:
            best = (tot, t1, l_d2, r_d2)
    assert (int(out["errors"]), int(out["t1"]), int(out["d2_left"]),
            int(out["d2_right"])) == best
    assert int(out["errors"]) <= int(out["errors_stump"])


def test_mad_histogram_path_is_row_free(ray_session):
    """The MAD/percentile family folds through the bounded cents
    histogram — its driver table must be <= distinct (type, cents)
    pairs, never the row count."""
    from nadry_search_engine_be_ray.pipelines.quant_ops import (
        _cents_histogram,
    )

    hist = _cents_histogram(SF)
    ev = _events()
    distinct = (ev.assign(c=np.round(ev["value"] * 100).astype(np.int64))
                .groupby(["event_type", "c"]).size())
    assert len(hist) == len(distinct)
    assert int(hist["cnt"].sum()) == len(ev)

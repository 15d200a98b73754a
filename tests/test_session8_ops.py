"""Brute-force reference tests for the session-8 operators: TPC-H tail
(Q21 lone-late-supplier logic), NTILE two-pass rank, EWMA closed form,
Naive Bayes, seeded SCC, KWIC, MLM masking and first-touch attribution.
The driver's DuckDB oracles hash-check these at sf0.01; these tests pin
the SEMANTICS against independent little-python recomputations so a
refactor can't silently drift inside the float-rounding tolerance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_ntile_matches_bruteforce_and_is_bin_count_independent(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_ntile_quartiles,
    )

    out = q_ntile_quartiles(SF)
    out7 = q_ntile_quartiles(SF, n_bins=7)
    pd.testing.assert_frame_equal(out, out7)

    odf = pd.read_parquet(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_totalprice"])
    odf = odf.sort_values(["o_totalprice", "o_orderkey"]).reset_index(
        drop=True)
    n = len(odf)
    size, rem = divmod(n, 4)
    tiles = np.empty(n, dtype=np.int64)
    r = 0
    for t in range(4):
        w = size + (1 if t < rem else 0)
        tiles[r:r + w] = t + 1
        r += w
    ref = (odf.assign(quartile=tiles)
           .groupby("quartile", as_index=False)
           .agg(n=("o_orderkey", "count"),
                sum_price=("o_totalprice", "sum")))
    ref["sum_price"] = ref["sum_price"].round(4)
    assert out["n"].tolist() == ref["n"].tolist()
    assert np.allclose(out["sum_price"], ref["sum_price"], atol=1e-3)


def test_ewma_closed_form_equals_recurrence(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import q_ewma_daily

    out = q_ewma_daily(SF, alpha=0.3)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    daily = (ev.groupby(["event_type", "day"], as_index=False)
             .agg(m=("value", "mean")))
    for _, row in out.iterrows():
        g = daily[daily["event_type"] == row["event_type"]].sort_values(
            "day")
        e = None
        for v in g["m"]:
            e = v if e is None else 0.3 * v + 0.7 * e
        assert row["n_days"] == len(g)
        assert abs(row["ewma"] - e) < 1e-4


def test_naive_bayes_matches_dict_reference(ray_session):
    import ray.data

    from nadry_search_engine_be_ray.stages.classifier import (
        nb_classify,
        nb_fit,
    )
    from nadry_search_engine_be_ray.stages.lm import doc_tokens

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    ds = ray.data.from_pandas(docs)
    model = nb_fit(ds, text_col="text", label_col="lang")
    got = nb_classify(ds, model).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    # independent dict-based reference
    from collections import Counter, defaultdict
    cnt = defaultdict(Counter)
    ndoc = Counter()
    for _, r in docs.iterrows():
        ndoc[r["lang"]] += 1
        cnt[r["lang"]].update(doc_tokens(r["text"]))
    labels = sorted(ndoc)
    vocab = len(set().union(*[set(c) for c in cnt.values()]))
    tot = {l: sum(cnt[l].values()) for l in labels}
    n_total = sum(ndoc.values())
    preds, scores = [], []
    for _, r in docs.sort_values("doc_id").iterrows():
        best, best_s = None, -np.inf
        for l in labels:
            s = np.log(ndoc[l] / n_total)
            for t in doc_tokens(r["text"]):
                s += np.log((cnt[l][t] + 1.0) / (tot[l] + vocab))
            if s > best_s + 1e-12:
                best, best_s = l, s
        preds.append(best)
        scores.append(best_s)
    assert got["pred_label"].tolist() == preds
    assert np.allclose(got["score"], np.round(scores, 4), atol=1e-3)


def test_scc_seeded_matches_bruteforce(ray_session):
    import ray.data

    from nadry_search_engine_be_ray.pipelines.pagerank import scc_seeded

    rng = np.random.RandomState(7)
    n, m = 60, 200
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
    }))
    got = scc_seeded(edges, source=5, n_rounds=4)

    def reach(adj, seed, rounds):
        depth = {seed: 0}
        fr = {seed}
        for r in range(1, rounds + 1):
            nxt = set()
            for u in fr:
                nxt |= adj.get(u, set())
            fr = nxt - depth.keys()
            for v in fr:
                depth[v] = r
        return depth

    fwd, bwd = {}, {}
    for s, d in zip(src, dst):
        if s != d:
            fwd.setdefault(s, set()).add(d)
            bwd.setdefault(d, set()).add(s)
    fd = reach(fwd, 5, 4)
    bd = reach(bwd, 5, 4)
    nodes = sorted(set(fd) & set(bd))
    assert got["node"].tolist() == nodes
    assert got["fwd_depth"].tolist() == [fd[x] for x in nodes]
    assert got["bwd_depth"].tolist() == [bd[x] for x in nodes]


def test_kwic_contexts_match_regex_reference(ray_session):
    import re

    from nadry_search_engine_be_ray.pipelines.textqueries import (
        kwic_concordance,
    )

    got = kwic_concordance(SF, term="batch", width=2)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    rows = []
    for _, r in docs.iterrows():
        toks = [t for t in re.split(r"[^a-z0-9]+", (r["text"] or "").lower())
                if t]
        for i, t in enumerate(toks):
            if t == "batch":
                rows.append({
                    "doc_id": r["doc_id"], "pos": i,
                    "left_ctx": " ".join(toks[max(i - 2, 0):i]),
                    "right_ctx": " ".join(toks[i + 1:i + 3]),
                })
    ref = pd.DataFrame(rows).sort_values(["doc_id", "pos"]).reset_index(
        drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "pos": "int64"}),
        ref.astype({"doc_id": "int64", "pos": "int64"}))


def test_mlm_masking_positions_and_labels(ray_session):
    import re

    from nadry_search_engine_be_ray.pipelines.textqueries import mlm_masking

    got = mlm_masking(SF).set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    for _, r in docs.head(40).iterrows():
        toks = [t for t in re.split(r"[^a-z0-9]+", (r["text"] or "").lower())
                if t]
        masked = [("[MASK]" if (i + 1) % 7 == 3 else t)
                  for i, t in enumerate(toks)]
        labels = [t for i, t in enumerate(toks) if (i + 1) % 7 == 3]
        row = got.loc[r["doc_id"]]
        assert row["masked_text"] == " ".join(masked)
        assert row["labels"] == " ".join(labels)
        assert row["n_masked"] == len(labels)


def test_first_touch_attribution_matches_pandas(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_attribution_first_touch,
    )

    got = q_attribution_first_touch(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"])
    first = ev.groupby("user_id").first()["event_type"]
    totals = ev.groupby("user_id")["value"].sum()
    ref = (pd.DataFrame({"event_type": first, "value": totals})
           .groupby("event_type")
           .agg(n_users=("value", "count"), sum_value=("value", "sum"))
           .reset_index())
    assert got["event_type"].tolist() == ref["event_type"].tolist()
    assert got["n_users"].tolist() == ref["n_users"].tolist()
    assert np.allclose(got["sum_value"], ref["sum_value"].round(4),
                       atol=1e-3)


def test_tpch_q21_guilty_supplier_logic(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import q_tpch_q21

    got = q_tpch_q21(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["late"] = j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=60)
    pairs = (j.groupby(["l_orderkey", "l_suppkey"], as_index=False)
             .agg(late=("late", "max")))
    ordstats = pairs.groupby("l_orderkey").agg(
        n_supp=("l_suppkey", "count"), n_late=("late", "sum"))
    guilty = pairs.merge(ordstats, on="l_orderkey")
    guilty = guilty[(guilty["late"]) & (guilty["n_supp"] > 1)
                    & (guilty["n_late"] == 1)]
    sup = pd.read_parquet(f"{SF}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])
    ref = (guilty.groupby("l_suppkey", as_index=False)
           .agg(numwait=("l_orderkey", "count"))
           .merge(sup, left_on="l_suppkey", right_on="s_suppkey")
           .sort_values(["numwait", "s_name"], ascending=[False, True])
           .head(25)[["s_name", "numwait"]].reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, ref.astype({"numwait": "int64"}))

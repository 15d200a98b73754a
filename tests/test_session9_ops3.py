"""Reference tests for the third session-9 wave: KMV sketch, orphan
keys, scalar-quantized ANN, deterministic random walks, running-distinct
growth, decayed counters, BM25+ and the NB confusion metrics."""

import hashlib

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_kmv_estimate_formula(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_kmv_distinct,
    )

    out = q_kmv_distinct(SF).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_partkey"])
    keys = sorted(set(li["l_partkey"].astype(int)))
    hs = sorted({int(hashlib.sha256(str(x).encode()).hexdigest()[:12], 16)
                 for x in keys})[:64]
    hk = hs[-1] / 16 ** 12
    assert out["exact_distinct"] == len(keys)
    assert out["k"] == len(hs)
    assert out["kmv_estimate"] == pytest.approx((len(hs) - 1) / hk, abs=1e-3)
    # sketch is within a plausible error band for k=64
    assert out["rel_error"] < 0.5


def test_orphan_rate_totals(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import q_orphan_keys

    out = q_orphan_keys(SF)
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    present = set(cust.loc[cust["c_acctbal"] >= 0, "c_custkey"])
    orphans = (~orders["o_custkey"].isin(present)).sum()
    assert int(out["n"].sum()) == len(orders)
    assert int(out["orphans"].sum()) == int(orphans)
    assert ((out["orphans"] <= out["n"]) & (out["orphan_rate"] <= 1)).all()


def test_sq_topk_close_to_exact(ray_session):
    import ray.data

    from nadry_search_engine_be_ray.stages.similarity import (
        _batch_matrix,
        sq_topk,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy(np.int64)
    q = x[np.argsort(ids)[:3]]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    out = sq_topk(ds, q, k=5).to_pandas()
    assert len(out) == 15
    # quantization reference: same arithmetic single-threaded
    lo, hi = x.min(axis=0), x.max(axis=0)
    step = (hi - lo) / 255
    step = np.where(step == 0, 1.0, step)
    deq = lo + (np.minimum(np.floor((x - lo) / step), 255) + 0.5) * step
    sims = np.round(deq @ q.T, 6)
    for qi in range(3):
        order = np.lexsort((ids, -sims[:, qi]))[:5]
        got = out[out["query_id"] == qi].sort_values("rank")
        assert got["vec_id"].tolist() == ids[order].tolist()
        assert np.allclose(got["score"], sims[order, qi], atol=1e-6)
    # SQ ranks should largely agree with exact dot-product ranks (top-1)
    exact = np.round(x @ q.T, 6)
    for qi in range(3):
        top_exact = ids[np.lexsort((ids, -exact[:, qi]))[0]]
        top_sq = out[(out["query_id"] == qi)
                     & (out["rank"] == 0)]["vec_id"].iloc[0]
        assert top_exact == top_sq


def test_random_walks_follow_hash_rule(ray_session):
    import __ray_entry__ as e

    out = e._q_random_walks(SF, n_seeds=5, steps=4)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    n = len(docs)
    adj: dict[int, set] = {}
    for d in range(n):
        for k in (1, 2, 3):
            dst = (d * d * 31 + k * 97) % n
            if dst != d:
                adj.setdefault(d, set()).add(dst)
                adj.setdefault(dst, set()).add(d)
    for wid in range(5):
        g = out[out["walk_id"] == wid].sort_values("step")
        assert g["node"].iloc[0] == wid
        for i in range(1, len(g)):
            cur = int(g["node"].iloc[i - 1])
            nb = sorted(adj.get(cur, ()))
            h = int(hashlib.sha256(
                f"{cur}:{int(g['step'].iloc[i])}".encode()).hexdigest()[:8],
                16)
            assert int(g["node"].iloc[i]) == nb[h % len(nb)]


def test_cumulative_pairs_monotone_and_total(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_cumulative_users,
    )

    out = q_cumulative_users(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    assert out["cum_pairs"].is_monotonic_increasing
    assert int(out["cum_pairs"].iloc[-1]) == \
        ev.drop_duplicates().shape[0]
    assert int(out["new_pairs"].sum()) == int(out["cum_pairs"].iloc[-1])


def test_decayed_counts_bounds(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_decayed_counts,
    )

    out = q_decayed_counts(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts"])
    ev["day"] = ev["ts"].dt.floor("D")
    for _, row in out.iterrows():
        g = ev[ev["event_type"] == row["event_type"]]
        md = ev["day"].max()
        ref = sum(0.5 ** ((md - d).days / 7.0) for d in g["day"])
        assert row["n_total"] == len(g)
        assert row["decayed"] == pytest.approx(ref, abs=1e-4)
        assert 0 < row["decayed"] < row["n_total"]


def test_bm25_plus_dominates_bm25(ray_session):
    """BM25+ adds idf * delta per matched term, so for every query each
    doc's BM25+ score strictly exceeds its BM25 score, and scores of
    docs matching MORE terms grow by more."""
    import __ray_entry__ as e

    plus = e._q_search_bm25_plus(SF)
    base = e._q_search_bm25(SF)
    m = plus.merge(base, on=["query", "doc_id"], suffixes=("_p", "_b"))
    assert len(m) > 0
    assert (m["score_p"] > m["score_b"]).all()


def test_nb_confusion_consistent_with_classify(ray_session):
    import __ray_entry__ as e

    conf = e._q_nb_confusion(SF)
    pred = e._q_naive_bayes(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    j = pred.merge(docs, on="doc_id")
    assert int(conf["tp"].sum()) == int((j["pred_label"] == j["lang"]).sum())
    assert int(conf["n_true"].sum()) == len(docs)
    assert int(conf["n_pred"].sum()) == len(docs)
    assert ((conf["f1"] >= 0) & (conf["f1"] <= 1)).all()

"""Reference tests for the second half of session 8: SSSP min-plus
rounds, SCD2 runs, id gaps, containment measure, KS statistic, JSD."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_sssp_matches_bellman_ford(ray_session):
    import ray.data

    from nadry_search_engine_be_ray.pipelines.pagerank import sssp_fixed

    rng = np.random.RandomState(3)
    n, m = 50, 180
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    w = (rng.randint(1, 9, m)).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "w": pa.array(w, pa.int64()),
    }))
    got = sssp_fixed(edges, source=7, n_rounds=4)

    INF = 10 ** 15
    dist = {7: 0}
    for _ in range(4):
        new = dict(dist)
        for s, d, ww in zip(src, dst, w):
            if s in dist and dist[s] + ww < new.get(d, INF):
                new[d] = dist[s] + ww
        dist = new
    nodes = sorted(dist)
    assert got["node"].tolist() == nodes
    assert got["dist"].tolist() == [dist[x] for x in nodes]


def test_scd2_runs_match_pandas(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_scd2_dimension,
    )

    got = q_scd2_dimension(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]).reset_index(drop=True)
    rows = []
    for uid, g in ev.groupby("user_id"):
        run = 0
        prev = None
        blocks = []
        for _, r in g.iterrows():
            if r["event_type"] != prev:
                run += 1
                blocks.append({"user_id": uid, "run": run,
                               "state": r["event_type"],
                               "valid_from": r["ts"], "last": r["ts"]})
                prev = r["event_type"]
            else:
                blocks[-1]["last"] = r["ts"]
        for i, b in enumerate(blocks):
            b["valid_to"] = (blocks[i + 1]["valid_from"]
                             if i + 1 < len(blocks) else b["last"])
            del b["last"]
        rows.extend(blocks)
    ref = pd.DataFrame(rows).sort_values(["user_id", "run"]).reset_index(
        drop=True)
    cast = {"user_id": "int64", "run": "int64",
            "valid_from": "datetime64[us]", "valid_to": "datetime64[us]"}
    pd.testing.assert_frame_equal(got.astype(cast), ref.astype(cast))


def test_id_gaps_cover_exact_complement(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import q_id_gaps

    got = q_id_gaps(SF, event_type="click", n_bins=16)
    got7 = q_id_gaps(SF, event_type="click", n_bins=7)
    pd.testing.assert_frame_equal(got, got7)  # bin-count independence
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ids = np.sort(ev.loc[ev["event_type"] == "click",
                         "event_id"].to_numpy(np.int64))
    d = np.diff(ids)
    g = np.flatnonzero(d > 1)
    ref = pd.DataFrame({
        "gap_start": ids[g] + 1,
        "gap_end": ids[g + 1] - 1,
    })
    ref["gap_len"] = ref["gap_end"] - ref["gap_start"] + 1
    pd.testing.assert_frame_equal(
        got, ref.astype("int64").reset_index(drop=True))


def test_containment_dominates_jaccard(ray_session):
    import ray.data

    from nadry_search_engine_be_ray.stages.dedup import ngram_jaccard_pairs

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    jac = ngram_jaccard_pairs(ds, n=3, threshold=0.0).to_pandas()
    con = ngram_jaccard_pairs(ds, n=3, threshold=0.0,
                              measure="containment").to_pandas()
    m = jac.merge(con, on=["a", "b"])
    assert len(m) == len(jac) == len(con)
    assert (m["containment"] >= m["jaccard"] - 1e-12).all()


def test_ks_statistic_matches_scipy_style_reference(ray_session):
    from nadry_search_engine_be_ray.pipelines.relational import (
        q_ks_test_2sample,
    )

    got = q_ks_test_2sample(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    a = np.sort(ev.loc[ev["event_type"] == "click", "value"].to_numpy())
    b = np.sort(ev.loc[ev["event_type"] == "error", "value"].to_numpy())
    allv = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, allv, side="right") / a.size
    f2 = np.searchsorted(b, allv, side="right") / b.size
    d = np.abs(f1 - f2).max()
    assert got["n1"][0] == a.size and got["n2"][0] == b.size
    assert abs(got["ks_d"][0] - d) < 1e-6


def test_jsd_symmetric_bounds(ray_session):
    from nadry_search_engine_be_ray.pipelines.textqueries import (
        js_divergence_sources,
    )

    out = js_divergence_sources(SF)
    assert (out["jsd"] >= 0).all()
    assert (out["jsd"] <= np.log(2) + 1e-9).all()
    assert (out["s1"] < out["s2"]).all()

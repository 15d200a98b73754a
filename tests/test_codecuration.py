"""Code-corpus curation (stages/codecuration.py): license detection, Stack
quality filters, winnowing clone detection, hybrid RRF.

Winnowing selection is cross-validated against an INDEPENDENT scalar
transcription of the Schleimer et al. rule (per-window rightmost minimum),
over random hash sequences and real plant content, for BOTH hash
representations; the SQL-oracle hash equality is the driver's job.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from nadry_search_engine_be_ray.pipelines.codequeries import (
    PLANTED_CODE,
    augment_with_plants,
)
from nadry_search_engine_be_ray.sources.corpus import make_corpus
from nadry_search_engine_be_ray.stages.codecuration import (
    AUTOGEN_MARKERS,
    LICENSE_RULES,
    WINNOW_K,
    WINNOW_W,
    _gram_hashes_sha,
    _gram_hashes_u64,
    _winnow_select,
    clone_pairs,
    license_detect,
    stack_file_metrics,
    stack_quality_filters,
    winnow_stats,
)


def _plants_ds():
    return ray.data.from_arrow(augment_with_plants(make_corpus(60)))


# ---------------------------------------------------------------------------
# license detection
# ---------------------------------------------------------------------------

def test_license_detect_plants(ray_session):
    out = license_detect(_plants_ds())
    got = dict(zip(out["repo"], out["license"]))
    assert got["plants/lic-mit"] == "mit"
    assert got["plants/lic-apache"] == "apache-2.0"
    assert got["plants/lic-gpl"] == "gpl-3.0"
    # priority: apache phrase listed first beats the mit phrase also present
    assert got["plants/lic-multi"] == "apache-2.0"
    # synthetic corpus content never matches a license phrase
    assert set(out["repo"]) == {
        "plants/lic-mit", "plants/lic-apache", "plants/lic-gpl",
        "plants/lic-multi",
    }


def test_license_rules_priority_is_declared_order():
    names = [n for n, _ in LICENSE_RULES]
    assert names[0] == "apache-2.0" and "mit" in names


# ---------------------------------------------------------------------------
# Stack quality filters
# ---------------------------------------------------------------------------

def _scalar_metrics(content: str) -> dict:
    lines = content.split("\n")
    lens = [len(l) for l in lines]
    n_chars = len(content)
    alnum = len(re.sub(r"[^A-Za-z0-9]", "", content))
    low = content.lower()
    autogen = any(m in low for m in AUTOGEN_MARKERS)
    avg = round(sum(lens) / max(len(lines), 1), 4)
    frac = round(alnum / max(n_chars, 1), 4)
    return {
        "n_lines": len(lines),
        "max_line_len": max(lens),
        "avg_line_len": avg,
        "frac_alnum": frac,
        "autogen": autogen,
        "keep": (
            max(lens) <= 400 and avg <= 120.0 and frac >= 0.25 and not autogen
        ),
    }


def test_stack_file_metrics_match_scalar(ray_session):
    out = stack_file_metrics(_plants_ds()).set_index("repo")
    for repo, path, lang, content in PLANTED_CODE:
        exp = _scalar_metrics(content)
        row = out.loc[repo] if repo in out.index else None
        assert row is not None, repo
        for k, v in exp.items():
            assert row[k] == v, (repo, k, row[k], v)


def test_stack_rejections(ray_session):
    out = stack_file_metrics(_plants_ds()).set_index("repo")
    assert not out.loc["plants/q-longline", "keep"]      # max_line_len
    assert not out.loc["plants/q-autogen", "keep"]       # autogen marker
    assert not out.loc["plants/q-punct", "keep"]         # frac_alnum
    assert out.loc["plants/q-good", "keep"]


def test_stack_quality_aggregate_consistent(ray_session):
    files = stack_file_metrics(_plants_ds())
    agg = stack_quality_filters(_plants_ds())
    # plants-only slice of the aggregate must reconcile with per-file rows
    plants = files[files["repo"].str.startswith("plants/")]
    sub = agg.set_index(["lang", "keep"])
    for (lang, keep), grp in plants.groupby(["lang", "keep"]):
        assert sub.loc[(lang, keep), "n_files"] >= len(grp)


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------

def _scalar_winnow(h: np.ndarray, w: int) -> set[tuple[int, int]]:
    """Independent transcription: per window, rightmost position of the
    minimum hash; short sequences are one whole-sequence window."""
    n = len(h)
    if n == 0:
        return set()
    sel = set()
    if n < w:
        windows = [(0, n)]
    else:
        windows = [(j, j + w) for j in range(n - w + 1)]
    for lo, hi in windows:
        mn = min(h[lo:hi])
        pos = max(i for i in range(lo, hi) if h[i] == mn)
        sel.add((int(pos), int(h[pos])))
    return sel


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_winnow_select_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    for n in (0, 1, 3, WINNOW_W - 1, WINNOW_W, 40, 200):
        # small hash alphabet to force plenty of ties -> exercises the
        # rightmost-min rule, not just the min
        h = rng.integers(0, 7, size=n).astype(np.int64)
        idx = _winnow_select(h)
        got = {(int(i), int(h[i])) for i in idx}
        assert got == _scalar_winnow(h, WINNOW_W), (seed, n)


def test_winnow_density_guarantee():
    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**32, size=500).astype(np.int64)
    idx = set(_winnow_select(h).tolist())
    # Schleimer guarantee: every window of w consecutive hashes contains a
    # selected position
    for j in range(500 - WINNOW_W + 1):
        assert any(p in idx for p in range(j, j + WINNOW_W))


def test_gram_hashes_sha_matches_hashlib():
    norm = "abcdefghijklmnopqrs"
    h = _gram_hashes_sha(norm, WINNOW_K)
    for i in range(len(norm) - WINNOW_K + 1):
        g = norm[i : i + WINNOW_K].encode()
        exp = int.from_bytes(hashlib.sha256(g).digest()[:4], "big")
        assert h[i] == exp


def test_gram_hashes_u64_shift_invariance():
    # same gram -> same hash regardless of position/context
    a = _gram_hashes_u64("xxhelloworldabcyy", WINNOW_K)
    b = _gram_hashes_u64("zzzhelloworldabcqqq", WINNOW_K)
    # "helloworldabc"[0:12] appears at offset 2 in a and 3 in b
    assert a[2] == b[3]
    # and distinct grams (essentially always) hash differently
    assert len(set(a.tolist())) > 1


def test_winnow_stats_exact_dup_docs_equal(ray_session):
    ds = _plants_ds()
    out = winnow_stats(ds).set_index("repo")
    a = out.loc["plants/clone-a"]
    b = out.loc["plants/clone-b"]
    # near-clones: same gram count (equal-length edit), similar fp count
    assert a["n_grams"] > 100 and b["n_grams"] > 100
    assert a["n_fp"] > 10 and b["n_fp"] > 10


@pytest.mark.parametrize("hash_repr", ["sha", "u64"])
def test_clone_pairs_find_planted_pair(ray_session, hash_repr):
    out = clone_pairs(_plants_ds(), hash_repr=hash_repr)
    plants = augment_with_plants(make_corpus(1))
    commits = dict(zip(plants["repo"].to_pylist(), plants["commit"].to_pylist()))
    ca, cb = sorted([commits["plants/clone-a"], commits["plants/clone-b"]])
    hit = out[(out["commit_a"] == ca) & (out["commit_b"] == cb)]
    assert len(hit) == 1, f"planted clone pair missing ({hash_repr})"
    assert int(hit["n_shared"].iloc[0]) >= 15
    # exact corpus duplicates (every 50th row repeats the previous) also pair
    assert len(out) >= 1


def test_clone_pairs_max_df_cut(ray_session):
    # with max_df=1 no hash can pair two files -> empty report
    out = clone_pairs(_plants_ds(), max_df=1)
    assert len(out) == 0


# ---------------------------------------------------------------------------
# hybrid RRF
# ---------------------------------------------------------------------------

def test_hybrid_rrf_contract(ray_session):
    from nadry_search_engine_be_ray.pipelines.textqueries import (
        bm25_simple, hybrid_rrf,
    )

    sf = "/root/testdata/sf0.001"
    out = hybrid_rrf(sf)
    assert list(out.columns) == ["doc_id", "rrf_score", "bm25_rank", "ann_rank"]
    assert len(out) == 10
    # descending fused score, ties by doc_id
    s = out["rrf_score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()
    # every row appears in at least one list
    assert ((out["bm25_rank"] > 0) | (out["ann_rank"] > 0)).all()
    # a doc present in both lists scores the sum of both reciprocal terms
    both = out[(out["bm25_rank"] > 0) & (out["ann_rank"] > 0)]
    for _, r in both.iterrows():
        exp = round(1.0 / (60 + r["bm25_rank"]) + 1.0 / (60 + r["ann_rank"]), 6)
        assert abs(r["rrf_score"] - exp) < 1e-9
    # bm25 leg consistency: the #1 bm25 doc carries bm25_rank == 1
    bm = bm25_simple(sf, k=1)
    top_bm = int(bm["doc_id"].iloc[0])
    row = out[out["doc_id"] == top_bm]
    if len(row):
        assert int(row["bm25_rank"].iloc[0]) == 1


# ---------------------------------------------------------------------------
# query-likelihood Dirichlet LM
# ---------------------------------------------------------------------------

def test_lm_dirichlet_contract(ray_session):
    import math

    import duckdb

    from nadry_search_engine_be_ray.pipelines.textqueries import (
        lm_dirichlet, simple_tokens,
    )

    sf = "/root/testdata/sf0.001"
    out = lm_dirichlet(sf, query="hash join", k=10, mu=500.0)
    assert list(out.columns) == ["doc_id", "score"]
    assert len(out) >= 1
    s = out["score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()
    # recompute the top hit's score exactly from the raw corpus
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).df()
    toks = {
        int(r.doc_id): [t for t in simple_tokens(r.text) if len(t) >= 2]
        for r in docs.itertuples()
    }
    total = sum(len(v) for v in toks.values())
    top = int(out["doc_id"].iloc[0])
    exp = 0.0
    for term in ["hash", "join"]:
        ctf = sum(v.count(term) for v in toks.values())
        if ctf == 0:
            continue
        tf = toks[top].count(term)
        exp += math.log(
            (tf + 500.0 * (ctf / total)) / (len(toks[top]) + 500.0)
        )
    assert abs(out["score"].iloc[0] - round(exp, 6)) < 1e-6
    # every returned doc matches at least one in-collection query term
    for d in out["doc_id"]:
        assert ("hash" in toks[int(d)]) or ("join" in toks[int(d)])


def test_lm_dirichlet_absent_term_dropped(ray_session):
    from nadry_search_engine_be_ray.pipelines.textqueries import lm_dirichlet

    sf = "/root/testdata/sf0.001"
    base = lm_dirichlet(sf, query="hash join", k=10)
    # a term with collection frequency 0 must not perturb the ranking
    # (p(t|C)=0 is undefined under the model; the term is dropped)
    with_ghost = lm_dirichlet(sf, query="hash join zzzqqqxyzzy", k=10)
    assert base.equals(with_ghost)


# ---------------------------------------------------------------------------
# linear learning-to-rank (closed-form normal equations)
# ---------------------------------------------------------------------------

def test_ltr_linear_matches_numpy_lstsq(ray_session):
    import duckdb
    import numpy as np

    from nadry_search_engine_be_ray.pipelines.textqueries import (
        ltr_linear, simple_tokens,
    )

    sf = "/root/testdata/sf0.001"
    out = ltr_linear(sf, k=10)
    assert list(out.columns) == ["doc_id", "yhat", "w0", "w1", "w2"]
    assert len(out) == 10
    s = out["yhat"].to_numpy()
    assert (s[:-1] >= s[1:]).all()

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).df()
    rows = []
    for r in docs.itertuples():
        ts = [t for t in simple_tokens(r.text) if len(t) >= 2]
        y = sum(1 for t in ("data", "hash", "join") if t in ts)
        rows.append((len(ts), ts.count("data"), y))
    X = np.array([[1.0, dl, tf] for dl, tf, _ in rows])
    yv = np.array([y for _, _, y in rows], dtype=np.float64)
    w, *_ = np.linalg.lstsq(X, yv, rcond=None)
    assert abs(out["w0"].iloc[0] - w[0]) < 1e-6
    assert abs(out["w1"].iloc[0] - w[1]) < 1e-6
    assert abs(out["w2"].iloc[0] - w[2]) < 1e-6
    # fitted score of the top row recomputes from its own features
    top = int(out["doc_id"].iloc[0])
    dl, tf, _ = rows[[i for i, r in enumerate(docs.itertuples())
                      if int(r.doc_id) == top][0]]
    exp = out["w0"].iloc[0] + out["w1"].iloc[0] * dl + out["w2"].iloc[0] * tf
    assert abs(out["yhat"].iloc[0] - exp) < 1e-4


def test_pmi_pairs_contract(ray_session):
    """PMI values recompute from an exact brute-force pair count and the
    support floor holds."""
    import math

    import duckdb

    from nadry_search_engine_be_ray.pipelines.textqueries import (
        pmi_pairs, simple_tokens,
    )

    sf = "/root/testdata/sf0.001"
    out = pmi_pairs(sf, df_lo=3, df_hi=40, k=10, min_pair=2)
    assert list(out.columns) == ["term_a", "term_b", "n_docs", "pmi"]
    assert (out["n_docs"] >= 2).all()
    s = out["pmi"].to_numpy()
    assert (s[:-1] >= s[1:]).all()

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).df()
    tsets = [set(t for t in simple_tokens(r.text) if len(t) >= 2)
             for r in docs.itertuples()]
    n = len(tsets)
    dfc: dict[str, int] = {}
    for ts in tsets:
        for t in ts:
            dfc[t] = dfc.get(t, 0) + 1
    for row in out.head(3).itertuples():
        c = sum(1 for ts in tsets
                if row.term_a in ts and row.term_b in ts)
        assert c == row.n_docs
        exp = math.log((n * c) / (dfc[row.term_a] * dfc[row.term_b]))
        assert abs(row.pmi - round(exp, 6)) < 1e-9


def test_phrase_suggest_bruteforce(ray_session):
    """Candidate pairs, counts and ranking recompute from a brute-force
    bigram table + stdlib edit distance."""
    import duckdb

    from nadry_search_engine_be_ray.pipelines.textqueries import (
        phrase_suggest, simple_tokens,
    )

    def lev(a: str, b: str) -> int:
        pa_, pb = a.encode(), b.encode()
        prev = list(range(len(pb) + 1))
        for i, ca in enumerate(pa_, 1):
            cur = [i]
            for j, cb in enumerate(pb, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    sf = "/root/testdata/sf0.001"
    out = phrase_suggest(sf, phrase="tble hach", k=5, max_distance=1)
    assert list(out.columns) == ["w1", "w2", "n", "dist"]

    docs = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf}/documents.parquet')"
    ).df()
    bigrams: dict[tuple, int] = {}
    vocab = set()
    for t in docs["text"]:
        ts = [w for w in simple_tokens(t) if len(w) >= 2]
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
    c1 = {t: lev("tble", t) for t in vocab if lev("tble", t) <= 1}
    c2 = {t: lev("hach", t) for t in vocab if lev("hach", t) <= 1}
    exp = sorted(
        ((a, b, n, c1[a] + c2[b]) for (a, b), n in bigrams.items()
         if a in c1 and b in c2),
        key=lambda r: (-r[2], r[3], r[0], r[1]),
    )[:5]
    assert [tuple(r) for r in out.itertuples(index=False)] == exp
    assert len(exp) >= 1  # the corpus supports at least one correction


def test_lm_jm_contract(ray_session):
    import math

    import duckdb

    from nadry_search_engine_be_ray.pipelines.textqueries import (
        lm_jelinek_mercer, simple_tokens,
    )

    sf = "/root/testdata/sf0.001"
    out = lm_jelinek_mercer(sf, query="hash join", k=10, lam=0.5)
    assert list(out.columns) == ["doc_id", "score"]
    assert len(out) >= 1
    s = out["score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).df()
    toks = {
        int(r.doc_id): [t for t in simple_tokens(r.text) if len(t) >= 2]
        for r in docs.itertuples()
    }
    total = sum(len(v) for v in toks.values())
    top = int(out["doc_id"].iloc[0])
    exp = 0.0
    for term in ["hash", "join"]:
        ctf = sum(v.count(term) for v in toks.values())
        if ctf == 0:
            continue
        tf = toks[top].count(term)
        exp += math.log(
            (1.0 - 0.5) * (tf / len(toks[top])) + 0.5 * (ctf / total)
        )
    assert abs(out["score"].iloc[0] - round(exp, 6)) < 1e-6

"""Query-path conformance: distributed engine vs single-process oracle on the
reference query set (FIXTURES.md §2) — rank-identical doc ids and
bit-identical scores (the engine and oracle share functions/scoring.py, so
any difference would come from the distributed candidate machinery)."""

import math
import os

import numpy as np
import pytest

from nadry_search_engine_be_ray.pipelines.query import SearchEngine
from nadry_search_engine_be_ray.sources.corpus import reference_queries


@pytest.fixture(scope="module")
def engine(built_index):
    return SearchEngine(built_index)


def _assert_same_results(got: dict, exp: dict):
    assert got["total_results"] == exp["total_results"]
    assert got["total_pages"] == exp["total_pages"]
    g_rows, e_rows = got["results"], exp["results"]
    assert len(g_rows) == len(e_rows)
    for g, e in zip(g_rows, e_rows):
        assert g["doc_id"] == e["doc_id"]
        for col in ("score", "relevance", "popularity"):
            if math.isnan(e[col]):
                assert math.isnan(g[col])
            else:
                assert g[col] == e[col], (col, g, e)


@pytest.mark.parametrize("q", reference_queries(), ids=lambda q: f"q{q['query_id']}")
def test_reference_query_set(engine, oracle_index, q):
    raw, page, size = q["query"], q["page"], q["page_size"]
    if raw.startswith('"'):
        phrase = raw.strip('"')
        got = engine.phrase_search(phrase, page, size)
        exp = oracle_index.phrase_search(phrase, page, size)
    else:
        got = engine.search(raw, page, size)
        exp = oracle_index.search(raw, page, size)
    _assert_same_results(got, exp)


def test_search_auto_quoted_detection(engine, oracle_index):
    got = engine.search_auto('find "item order" now')
    exp = oracle_index.phrase_search("item order")
    _assert_same_results(got, exp)


def test_additive_matches_oracle(engine, oracle_index):
    for q in ("item order arrived", "search engine", "import", "nation"):
        exp = [
            (int(doc_id[:15], 16), w)
            for doc_id, w in oracle_index.additive_search(q, k=10)
        ]
        got = engine.additive_search(q, k=10)
        assert got == exp


@pytest.mark.parametrize("scorer", ["additive", "bm25"])
def test_wand_equals_taat(engine, scorer):
    queries = [
        "item order arrived", "search engine index", "import return def",
        "nation", "zzzznotaterm", "func_7 zq11x", "university community block",
    ]
    for q in queries:
        taat = engine.topk_taat(q, k=10, scorer=scorer)
        wand = engine.topk_wand(q, k=10, scorer=scorer)
        assert [d for d, _ in taat] == [d for d, _ in wand], q
        for (d1, s1), (d2, s2) in zip(taat, wand):
            assert s1 == pytest.approx(s2, rel=1e-12)


@pytest.mark.parametrize("scorer", ["additive", "bm25"])
def test_maxscore_equals_taat(engine, scorer):
    """Vectorized MaxScore must be EXACT (docs and scores), including its
    pruning branch — exercised with many-term queries mixing head terms
    (huge lists, low idf) and rare terms (the pruning-profitable shape)."""
    queries = [
        "item order arrived", "search engine index", "import return def",
        "nation", "zzzznotaterm", "func_7 zq11x", "university community block",
        "import return def the nation order item search engine running",
        "import import import order",
    ]
    for q in queries:
        taat = engine.topk_taat(q, k=10, scorer=scorer)
        ms = engine.topk_maxscore(q, k=10, scorer=scorer)
        assert [d for d, _ in taat] == [d for d, _ in ms], q
        for (d1, s1), (d2, s2) in zip(taat, ms):
            assert s1 == pytest.approx(s2, rel=1e-12)
    for k in (1, 3, 25):
        assert engine.topk_maxscore("item order", k=k, scorer=scorer) == \
            engine.topk_taat("item order", k=k, scorer=scorer)


def test_query_cache(engine):
    r1 = engine.search("item order arrived")
    r2 = engine.search("item order arrived")
    assert r1 is r2  # T4 query-result cache


def test_proximity_pairs_matches_bruteforce(built_index):
    """proximity_pairs' searchsorted window counting must equal a brute
    double loop over the decoded positions, per doc per field."""
    import numpy as np

    from nadry_search_engine_be_ray.pipelines.query import proximity_pairs
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    r = SegmentReader(built_index)
    # pick frequent terms so the intersection is non-trivial
    terms = sorted(r.terms(), key=lambda t: -r.postings(t).df)[:4]
    window = 2
    out = proximity_pairs(built_index, terms, window, concurrency=2)
    got = {
        (a, b, d): n
        for a, b, d, n in zip(out["term_a"].to_pylist(),
                              out["term_b"].to_pylist(),
                              out["doc_int"].to_pylist(),
                              out["n_pairs"].to_pylist())
    }
    assert got, "expected at least one proximity hit among head terms"
    exp = {}
    ts = sorted(set(terms))
    for i, a in enumerate(ts):
        for b in ts[i + 1:]:
            pla, plb = r.postings(a), r.postings(b)
            common = np.intersect1d(pla.docs, plb.docs)
            for di in common.tolist():
                fa = pla.positions_for(int(np.searchsorted(pla.docs, di)))
                fb = plb.positions_for(int(np.searchsorted(plb.docs, di)))
                n = sum(
                    1
                    for f, ap in fa.items()
                    if f in fb
                    for x in ap.tolist()
                    for y in fb[f].tolist()
                    if abs(x - y) <= window
                )
                if n:
                    exp[(a, b, int(di))] = n
    assert got == exp


def test_proximity_pairs_edges(built_index):
    from nadry_search_engine_be_ray.pipelines.query import proximity_pairs
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    # fewer than two terms -> no pairs -> empty table with the full schema
    out = proximity_pairs(built_index, ["onlyterm"], 3)
    assert out.num_rows == 0
    assert out.column_names == ["term_a", "term_b", "doc_int", "n_pairs"]
    # unknown terms are skipped, not an error
    out = proximity_pairs(built_index, ["zzznotaterm", "zzzalsonot"], 3)
    assert out.num_rows == 0
    # window=0 can never match across distinct terms (positions are unique
    # within a field), so every n_pairs row would need |pa-pb|=0
    r = SegmentReader(built_index)
    terms = sorted(r.terms(), key=lambda t: -r.postings(t).df)[:3]
    out = proximity_pairs(built_index, terms, 0)
    assert out.num_rows == 0


def test_proximity_ordered_matches_bruteforce(built_index):
    import numpy as np

    from nadry_search_engine_be_ray.pipelines.query import proximity_pairs
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    r = SegmentReader(built_index)
    terms = sorted(r.terms(), key=lambda t: -r.postings(t).df)[:4]
    window = 2
    out = proximity_pairs(built_index, terms, window, ordered=True,
                          concurrency=2)
    got = {
        (a, b, d): n
        for a, b, d, n in zip(out["term_a"].to_pylist(),
                              out["term_b"].to_pylist(),
                              out["doc_int"].to_pylist(),
                              out["n_pairs"].to_pylist())
    }
    exp = {}
    ts = sorted(set(terms))
    for i, a in enumerate(ts):
        for b in ts[i + 1:]:
            pla, plb = r.postings(a), r.postings(b)
            common = np.intersect1d(pla.docs, plb.docs)
            for di in common.tolist():
                fa = pla.positions_for(int(np.searchsorted(pla.docs, di)))
                fb = plb.positions_for(int(np.searchsorted(plb.docs, di)))
                n = sum(
                    1
                    for f, ap in fa.items()
                    if f in fb
                    for x in ap.tolist()
                    for y in fb[f].tolist()
                    if 1 <= y - x <= window
                )
                if n:
                    exp[(a, b, int(di))] = n
    assert got == exp
    # ordered counts can never exceed the unordered counts
    un = proximity_pairs(built_index, terms, window, concurrency=2)
    un_map = {
        (a, b, d): n
        for a, b, d, n in zip(un["term_a"].to_pylist(),
                              un["term_b"].to_pylist(),
                              un["doc_int"].to_pylist(),
                              un["n_pairs"].to_pylist())
    }
    for k, n in got.items():
        assert n <= un_map[k], k


def test_proximity_out_path_streams_same_rows(built_index, tmp_path):
    import pyarrow.dataset as pads

    from nadry_search_engine_be_ray.pipelines.query import proximity_pairs
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    r = SegmentReader(built_index)
    terms = sorted(r.terms(), key=lambda t: -r.postings(t).df)[:4]
    direct = proximity_pairs(built_index, terms, 2, concurrency=2)
    out = str(tmp_path / "prox")
    assert proximity_pairs(built_index, terms, 2, concurrency=2,
                           out_path=out) is None
    streamed = pads.dataset(out, format="parquet").to_table().sort_by(
        [("term_a", "ascending"), ("term_b", "ascending"),
         ("doc_int", "ascending")])
    assert streamed.equals(direct)


def test_facet_counts_matches_bruteforce(built_index):
    """facet_counts (any + all modes) must equal a brute recompute from the
    decoded posting lists joined to the prepped facet columns."""
    import os
    from collections import Counter

    import numpy as np
    import pyarrow.dataset as pads

    from nadry_search_engine_be_ray.pipelines.query import facet_counts
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    r = SegmentReader(built_index)
    terms = sorted(r.terms(), key=lambda t: -r.postings(t).df)[:3]
    meta = pads.dataset(
        os.path.join(built_index, "prepped"), format="parquet"
    ).to_table(columns=["doc_int", "repo", "lang"])
    di = meta["doc_int"].to_numpy(zero_copy_only=False).astype(np.int64)
    by_doc = {
        int(d): (rp, lg)
        for d, rp, lg in zip(di, meta["repo"].to_pylist(),
                             meta["lang"].to_pylist())
    }

    for mode in ("any", "all"):
        sets = [set(r.postings(t).docs.tolist()) for t in terms]
        matched = (set.intersection(*sets) if mode == "all"
                   else set.union(*sets))
        exp: Counter = Counter()
        for d in matched:
            rp, lg = by_doc[int(d)]
            exp[("repo", rp)] += 1
            exp[("lang", lg)] += 1
        out = facet_counts(built_index, terms, mode=mode)
        got = {
            (f, v): n
            for f, v, n in zip(out["facet"].to_pylist(),
                               out["value"].to_pylist(),
                               out["n_docs"].to_pylist())
        }
        assert got == dict(exp), mode
        assert matched, "head terms should match at least one doc"


def test_facet_counts_edges(built_index):
    from nadry_search_engine_be_ray.pipelines.query import facet_counts

    assert facet_counts(built_index, []).num_rows == 0
    assert facet_counts(built_index, ["zzzznope"]).num_rows == 0
    # unknown + known term: any-mode ignores the miss, all-mode empties
    from nadry_search_engine_be_ray.state.segments import SegmentReader
    r = SegmentReader(built_index)
    head = max(r.terms(), key=lambda t: r.postings(t).df)
    any_out = facet_counts(built_index, [head, "zzzznope"], mode="any")
    assert any_out.num_rows > 0
    all_out = facet_counts(built_index, [head, "zzzznope"], mode="all")
    assert all_out.num_rows == 0


def test_spell_correct_matches_bruteforce_and_tiers(built_index,
                                                    tiny_corpus_dir,
                                                    tmp_path_factory):
    """spell_correct's vectorized byte-DP + distributed combine must equal
    a brute per-pair recompute, and the uncompacted tier (per-salt df rows
    summed at the combine) must answer identically to the compacted one."""
    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index
    from nadry_search_engine_be_ray.pipelines.query import spell_correct
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    def lev(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    words = ["serch", "documnt", "nosuchwordatall", "engin"]
    out = spell_correct(built_index, words, max_distance=2)
    got = {
        q: (s, d, f)
        for q, s, d, f in zip(out["query"].to_pylist(),
                              out["suggestion"].to_pylist(),
                              out["distance"].to_pylist(),
                              out["df"].to_pylist())
    }

    r = SegmentReader(built_index)
    exp = {}
    for w in words:
        wb = w.encode()
        best = None
        for t in r.terms():
            d = lev(wb, t.encode())
            if d <= 2:
                key = (d, -r.postings(t).df, t)
                if best is None or key < best[0]:
                    best = (key, t, d, r.postings(t).df)
        if best is not None:
            exp[w] = (best[1], best[2], best[3])
    assert got == exp
    assert "nosuchwordatall" not in got and "serch" in got

    idx_u = str(tmp_path_factory.mktemp("index_uncompacted_spell"))
    build_index(tiny_corpus_dir, idx_u,
                BuildConfig(num_shards=2, salt_bits=2,
                            compact_segments=False))
    out_u = spell_correct(idx_u, words, max_distance=2)
    assert out_u.to_pylist() == out.to_pylist()


def test_prefix_suggest_matches_bruteforce_and_tiers(built_index,
                                                     tiny_corpus_dir,
                                                     tmp_path_factory):
    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index
    from nadry_search_engine_be_ray.pipelines.query import prefix_suggest
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    prefixes = ["se", "i", "zzqx"]
    out = prefix_suggest(built_index, prefixes, k=3)
    got = list(zip(out["prefix"].to_pylist(), out["term"].to_pylist(),
                   out["df"].to_pylist(), out["rank"].to_pylist()))

    r = SegmentReader(built_index)
    exp = []
    for p in sorted(set(prefixes)):
        hits = sorted(
            ((t, r.postings(t).df) for t in r.terms() if t.startswith(p)),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        exp.extend((p, t, d, i + 1) for i, (t, d) in enumerate(hits))
    assert got == exp
    assert any(p == "se" for p, *_ in got)
    assert not any(p == "zzqx" for p, *_ in got)

    idx_u = str(tmp_path_factory.mktemp("index_uncompacted_prefix"))
    build_index(tiny_corpus_dir, idx_u,
                BuildConfig(num_shards=2, salt_bits=2,
                            compact_segments=False))
    out_u = prefix_suggest(idx_u, prefixes, k=3)
    assert out_u.to_pylist() == out.to_pylist()


def test_boolean_search_matches_set_bruteforce(built_index):
    import os

    import numpy as np
    import pyarrow.dataset as pads

    from nadry_search_engine_be_ray.pipelines.query import boolean_search
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    r = SegmentReader(built_index)
    terms = sorted(r.terms(), key=lambda t: -r.postings(t).df)[:4]
    a, b, c, d = terms
    exprs = {
        "x_and": ("and", a, b),
        "x_or": ("or", c, d),
        "x_not": ("not", a),
        "x_mix": ("or", ("and", a, ("not", b)), ("and", c, d)),
    }
    out = boolean_search(built_index, exprs)
    got: dict[str, set] = {}
    for n, di in zip(out["name"].to_pylist(), out["doc_int"].to_pylist()):
        got.setdefault(n, set()).add(di)

    universe = set(
        pads.dataset(os.path.join(built_index, "doc_stats"),
                     format="parquet")
        .to_table(columns=["doc_int"])["doc_int"].to_pylist()
    )
    s = {t: set(r.postings(t).docs.tolist()) for t in terms}
    exp = {
        "x_and": s[a] & s[b],
        "x_or": s[c] | s[d],
        "x_not": universe - s[a],
        "x_mix": (s[a] - s[b]) | (s[c] & s[d]),
    }
    exp = {k: v for k, v in exp.items() if v}
    assert got == exp
    # emitted order is (name, doc_int) sorted
    rows = list(zip(out["name"].to_pylist(), out["doc_int"].to_pylist()))
    assert rows == sorted(rows)


def test_wildcard_kgram_equals_scan_path(built_index):
    """The k-gram-pruned wildcard path must return exactly the stream-scan
    path's answers, including unprunable patterns (fallback) and patterns
    with no matches."""
    from nadry_search_engine_be_ray.pipelines.query import (
        wildcard_terms, wildcard_terms_kgram,
    )

    pats = ["se%ch", "%tion", "q__ri", "zzqx%", "%a%", "import"]
    scan = wildcard_terms(built_index, pats)
    kgram = wildcard_terms_kgram(built_index, pats)
    assert kgram.to_pylist() == scan.to_pylist()
    got_pats = set(kgram["pattern"].to_pylist())
    assert "%a%" in got_pats      # unprunable fallback produced rows
    assert "import" in got_pats   # no-wildcard exact pattern
    assert "zzqx%" not in got_pats


def test_numeric_range_matches_bruteforce(built_index):
    from nadry_search_engine_be_ray.pipelines.query import (
        numeric_range_search,
    )
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    lo, hi = 10, 99
    out = numeric_range_search(built_index, lo, hi)
    got = dict(zip(out["doc_int"].to_pylist(), out["n_terms"].to_pylist()))

    r = SegmentReader(built_index)
    exp: dict[int, int] = {}
    n_terms_in_range = 0
    for t in r.terms():
        if not t.startswith("num:"):
            continue
        try:
            v = int(t[4:])
        except ValueError:
            continue
        if lo <= v <= hi:
            n_terms_in_range += 1
            for d in r.postings(t).docs.tolist():
                exp[d] = exp.get(d, 0) + 1
    assert got == exp and exp, "corpus should index in-range numbers"
    assert n_terms_in_range >= 1
    # wide range: every numeric term participates
    all_num = {t for t in r.terms()
               if t.startswith("num:") and t[4:].isdigit()}
    wide = numeric_range_search(built_index, 0, 10**12)
    assert sum(wide["n_terms"].to_pylist()) == sum(
        r.postings(t).df for t in all_num)
    # empty range behaves
    assert numeric_range_search(built_index, 10**15, 10**15 + 1).num_rows == 0


def test_more_like_this_matches_bruteforce(built_index):
    import os

    import numpy as np
    import pyarrow.dataset as pads

    from nadry_search_engine_be_ray.pipelines.query import more_like_this
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    r = SegmentReader(built_index)
    di = pads.dataset(os.path.join(built_index, "doc_stats"),
                      format="parquet").to_table(columns=["doc_int"])
    src = min(di["doc_int"].to_pylist())
    out = more_like_this(built_index, src, n_terms=4, k=5)

    # brute: term vector = every term whose posting list contains src
    tv = []
    for t in r.terms():
        pl = r.postings(t)
        j = int(np.searchsorted(pl.docs, src))
        if j < pl.df and pl.docs[j] == src:
            tv.append((t, int(pl.tfs[j]), pl.df))
    sel = [t for t, _, _ in sorted(tv, key=lambda x: (-x[1], x[2], x[0]))[:4]]
    scores: dict[int, float] = {}
    for t in sel:
        pl = r.postings(t)
        for d, w in zip(pl.docs.tolist(), pl.weights.tolist()):
            if d != src:
                scores[d] = scores.get(d, 0.0) + w
    exp = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:5]
    got = list(zip(out["doc_int"].to_pylist(), out["score"].to_pylist()))
    assert got == [(d, round(s, 9)) for d, s in exp]
    assert out["rank"].to_pylist() == list(range(1, len(exp) + 1))
    assert src not in out["doc_int"].to_pylist()
    # unknown doc -> empty
    assert more_like_this(built_index, -1).num_rows == 0


# ---------------------------------------------------------------------------
# keyset pagination + field collapsing
# ---------------------------------------------------------------------------

def test_search_after_equals_rank_window(engine):
    """Pages chained by the (score, doc_int) cursor must tile the single
    top-k ranking exactly (SearchEngine.search_after: strict-after filter
    under the total order (score DESC, doc_int ASC))."""
    for q in ["search engine query", "document the", "alpha beta"]:
        full = engine.topk_taat(q, k=30, scorer="bm25")
        if not full:
            continue
        pages, cursor = [], None
        for _ in range(3):
            page = engine.search_after(q, cursor, k=10, scorer="bm25")
            if not page:
                break
            pages.extend(page)
            cursor = (page[-1][1], page[-1][0])
        assert pages == full[: len(pages)]
        assert len(pages) == min(30, len(full))


def test_search_after_empty_and_tail(engine):
    assert engine.search_after("zzznotaterm", None, k=5) == []
    q = "search engine"
    full = engine.topk_taat(q, k=10 ** 6, scorer="bm25")
    last = (full[-1][1], full[-1][0])
    assert engine.search_after(q, last, k=5, scorer="bm25") == []


def test_collapse_by_group_matches_bruteforce(built_index):
    """CollapseEvalActor == pandas groupby-idxmax brute force: one winner
    per repo by (score DESC, doc_int ASC), global top-k over winners."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data

    from nadry_search_engine_be_ray.pipelines.query import SearchEngine
    from nadry_search_engine_be_ray.pipelines.serve import CollapseEvalActor

    qs = ["search engine query", "document the", "alpha beta"]
    out = ray.data.from_arrow(
        pa.table({"query": pa.array(qs, pa.string())})
    ).map_batches(
        CollapseEvalActor, fn_constructor_args=(built_index,),
        batch_format="pyarrow", batch_size=16, concurrency=2,
    ).to_pandas()

    eng = SearchEngine(built_index)
    meta = pads.dataset(
        os.path.join(built_index, "prepped"), format="parquet"
    ).to_table(columns=["doc_int", "repo"]).to_pandas()
    for q in qs:
        docs, acc = eng.all_scores(q, "bm25")
        df = pd.DataFrame({"doc_int": docs, "score": acc}).merge(
            meta, on="doc_int"
        )
        df = df.sort_values(
            ["score", "doc_int"], ascending=[False, True]
        ).drop_duplicates("repo").head(10).reset_index(drop=True)
        got = out[out["query"] == q].sort_values("rank")
        assert got["doc_id"].tolist() == [
            f"{int(d):015x}" for d in df["doc_int"]
        ]
        assert got["group"].tolist() == df["repo"].tolist()
        assert np.allclose(got["score"].to_numpy(), df["score"].to_numpy())


def test_weighted_scores_plain_multiset_special_case(engine):
    """all_scores_weighted with weights = token multiplicities must equal
    the plain accumulator (w*x vs x added w times is exact; only cross-term
    addition order differs -> allclose)."""
    from collections import Counter

    q = "search engine query the search"
    tokens = engine.tokenizer.tokenize(q)
    w = {t: float(m) for t, m in Counter(tokens).items()}
    d1, s1 = engine.all_scores(q, "bm25")
    d2, s2 = engine.all_scores_weighted(w, "bm25")
    assert np.array_equal(d1, d2)
    assert np.allclose(s1, s2, rtol=1e-12)


def test_rocchio_expansion_changes_ranking(built_index):
    """Rocchio: expansion terms are new (not in the query), weight beta
    contributes, and beta=0 degrades to plain BM25 top-10."""
    import pyarrow as pa
    import ray.data

    from nadry_search_engine_be_ray.pipelines.serve import RocchioEvalActor

    qds = ray.data.from_arrow(
        pa.table({"query": pa.array(["search engine query"], pa.string())})
    )
    out = qds.map_batches(
        RocchioEvalActor, fn_constructor_args=(built_index,),
        batch_format="pyarrow", batch_size=4, concurrency=1,
    ).to_pandas()
    assert len(out) > 0

    zero = qds.map_batches(
        RocchioEvalActor, fn_constructor_args=(built_index, 5, 3, 0.0),
        batch_format="pyarrow", batch_size=4, concurrency=1,
    ).to_pandas()
    eng = SearchEngine(built_index)
    plain = eng.topk_taat("search engine query", k=10, scorer="bm25")
    assert zero["doc_id"].tolist() == [f"{d:015x}" for d, _ in plain]
    assert np.allclose(
        zero["score"].to_numpy(), [s for _, s in plain], rtol=1e-12
    )


def test_bm25f_scores_accumulated_field_weight(engine):
    """bm25f == BM25 saturation applied to the stored accumulated field
    weight (brute-force recompute from the posting lists)."""
    q = "search engine query"
    got = engine.topk_taat(q, k=10, scorer="bm25f")
    assert got

    tokens = engine.tokenizer.tokenize(q)
    n = engine.stats["n_docs"]
    avgdl = engine.stats["avgdl"]
    acc = {}
    for t in set(tokens):
        pl = engine.reader.postings(t)
        if pl is None:
            continue
        idf = math.log((n - pl.df + 0.5) / (pl.df + 0.5) + 1.0)
        tw, _ = engine.docs.lookup(pl.docs)
        mult = tokens.count(t)
        for d, w, dl in zip(pl.docs, pl.weights, tw):
            s = idf * (w * 2.2) / (w + 1.2 * (0.25 + 0.75 * dl / avgdl))
            acc[int(d)] = acc.get(int(d), 0.0) + mult * s
    exp = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in exp]
    assert np.allclose([s for _, s in got], [s for _, s in exp], rtol=1e-9)


def test_synonym_expansion_gamma_zero_is_plain(built_index):
    """gamma=0 synonym expansion must equal plain BM25 (synonym weights
    become 0 and a 0-weight term adds exact-zero contributions)."""
    import pyarrow as pa
    import ray.data

    from nadry_search_engine_be_ray.pipelines.serve import SynonymEvalActor

    qds = ray.data.from_arrow(
        pa.table({"query": pa.array(["search engine"], pa.string())})
    )
    out = qds.map_batches(
        SynonymEvalActor, fn_constructor_args=(built_index, None, 0.0),
        batch_format="pyarrow", batch_size=4, concurrency=1,
    ).to_pandas()
    eng = SearchEngine(built_index)
    plain = eng.topk_taat("search engine", k=10, scorer="bm25")
    assert out["doc_id"].tolist() == [f"{d:015x}" for d, _ in plain]
    assert np.allclose(
        out["score"].to_numpy(), [s for _, s in plain], rtol=1e-12
    )


def test_stem_thesaurus_drops_multi_token_and_self(built_index):
    from nadry_search_engine_be_ray.pipelines.serve import stem_thesaurus

    eng = SearchEngine(built_index)
    syn = stem_thesaurus(
        {"search": ["searches", "find me", "lookup"],
         "the": ["a"]},  # stopwords tokenize to [] -> dropped
        eng.tokenizer,
    )
    # "searches" stems to "search" (self) and "find me" is 2 tokens
    assert syn.get("search") == ["lookup"]
    assert "the" not in syn


def test_field_search_matches_postings_dump(built_index):
    """FieldSearchEvalActor's positions-derived per-field tf must equal
    the build's postings-phase parquet rows (the same numbers the SQL
    oracle reads)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray.data

    from nadry_search_engine_be_ray.pipelines.serve import FieldSearchEvalActor

    a = FieldSearchEvalActor.__new__(FieldSearchEvalActor)
    a.engine = SearchEngine(built_index)
    a.field = 1
    a.k = 10
    post = pads.dataset(
        os.path.join(built_index, "postings"), format="parquet",
        partitioning="hive",
    )
    for term in ["search", "engin", "queri"]:
        fp = a._field_postings(term)
        rows = post.to_table(
            columns=["doc_int", "tf"],
            filter=(pc.field("term") == term) & (pc.field("field") == 1),
        )
        exp = rows.to_pandas().groupby("doc_int")["tf"].sum().sort_index()
        if fp is None:
            assert len(exp) == 0, term
            continue
        docs, tff, _ = fp
        assert docs.tolist() == exp.index.tolist(), term
        assert tff.tolist() == exp.values.astype(float).tolist(), term


def test_explain_contributions_sum_to_score(built_index):
    """Explain rows for a (query, doc) must sum to the doc's BM25 score
    (contributions are rounded to 9 dp; tolerance covers the rounding)."""
    import pyarrow as pa
    import ray.data

    from nadry_search_engine_be_ray.pipelines.serve import ExplainEvalActor

    q = "search engine query"
    out = ray.data.from_arrow(
        pa.table({"query": pa.array([q], pa.string())})
    ).map_batches(
        ExplainEvalActor, fn_constructor_args=(built_index,),
        batch_format="pyarrow", batch_size=4, concurrency=1,
    ).to_pandas()
    assert len(out) > 0
    eng = SearchEngine(built_index)
    top = {f"{d:015x}": s for d, s in eng.topk_taat(q, k=3, scorer="bm25")}
    sums = out.groupby("doc_id")["contribution"].sum()
    assert set(sums.index) == set(top)
    for doc, s in sums.items():
        assert abs(s - top[doc]) < 1e-7, doc


def test_sloppy_phrase_slop1_equals_exact_adjacency(engine):
    """slop=1 sloppy phrase must match exactly the docs the exact phrase
    chain matches (same adjacency semantics; ranking differs only in the
    scorer, so compare doc sets)."""
    for phrase in ["item order", "order arrived late"]:
        sloppy = {d for d, _ in
                  engine.sloppy_phrase_search(phrase, slop=1, k=10 ** 6)}
        exact = engine.phrase_search(phrase, 0, 10 ** 6)
        # result doc_id is the full-length id; doc_int is its 15-hex prefix
        exact_docs = {int(r["doc_id"][:15], 16) for r in exact["results"]}
        assert sloppy == exact_docs, phrase


def test_sloppy_phrase_monotone_in_slop(engine):
    """Raising slop can only ADD matching docs (the window widens)."""
    prev: set = set()
    for slop in [1, 2, 4, 8]:
        cur = {d for d, _ in
               engine.sloppy_phrase_search("item order", slop, k=10 ** 6)}
        assert prev <= cur, slop
        prev = cur


def test_sloppy_phrase_bruteforce_window(engine):
    """Chain membership == brute-force scan over decoded positions."""
    phrase, slop = "item order", 3
    toks = engine.tokenizer.tokenize(phrase)
    pls = [engine.reader.postings(t) for t in toks]
    assert all(p is not None for p in pls)
    got = {d for d, _ in
           engine.sloppy_phrase_search(phrase, slop, k=10 ** 6)}
    exp = set()
    common = np.intersect1d(pls[0].docs, pls[1].docs)
    for d in common.tolist():
        pa_ = pls[0].positions_for(int(np.searchsorted(pls[0].docs, d)))
        pb_ = pls[1].positions_for(int(np.searchsorted(pls[1].docs, d)))
        for f, ps in pa_.items():
            qs = pb_.get(f)
            if qs is None:
                continue
            if any(1 <= q - p <= slop for p in ps for q in qs):
                exp.add(int(d))
                break
    assert got == exp


def test_facet_stats_matches_pandas_bruteforce(built_index):
    import pyarrow.dataset as pads

    from nadry_search_engine_be_ray.pipelines.query import facet_stats

    out = facet_stats(built_index, ["search", "engin"],
                      facet="lang").to_pandas()
    assert len(out) > 0

    eng = SearchEngine(built_index)
    matched = np.union1d(eng.reader.postings("search").docs,
                         eng.reader.postings("engin").docs)
    meta = pads.dataset(
        os.path.join(built_index, "prepped"), format="parquet"
    ).to_table(columns=["doc_int", "lang"]).to_pandas()
    stats = pads.dataset(
        os.path.join(built_index, "doc_stats"), format="parquet"
    ).to_table().to_pandas()
    df = meta[meta["doc_int"].isin(matched)].merge(stats, on="doc_int")
    exp = df.groupby("lang")["total_words"].agg(
        ["count", "sum", "min", "max"]
    ).sort_index()
    assert out["value"].tolist() == exp.index.tolist()
    assert out["n_docs"].tolist() == exp["count"].tolist()
    assert out["sum_words"].tolist() == exp["sum"].tolist()
    assert out["min_words"].tolist() == exp["min"].tolist()
    assert out["max_words"].tolist() == exp["max"].tolist()

    # no matches -> empty table with the declared schema
    empty = facet_stats(built_index, ["zzznotaterm"])
    assert empty.num_rows == 0


def test_significant_terms_matches_bruteforce(built_index):
    """Partial-top-k segment scan == brute-force lift over every term."""
    from nadry_search_engine_be_ray.pipelines.query import significant_terms

    out = significant_terms(built_index, ["search", "engin"],
                            k=10).to_pandas()
    assert len(out) == 10

    eng = SearchEngine(built_index)
    matched = np.union1d(eng.reader.postings("search").docs,
                         eng.reader.postings("engin").docs)
    n_docs = eng.stats["n_docs"]
    rows = []
    for t in eng.reader.terms():
        pl = eng.reader.postings(t)
        nm = int(np.isin(pl.docs, matched).sum())
        if nm >= 3:
            lift = (nm / matched.size) / (pl.df / n_docs)
            rows.append((t, nm, pl.df, round(lift, 9)))
    rows.sort(key=lambda r: (-r[3], -r[1], r[0]))
    exp = rows[:10]
    assert list(map(tuple, out.itertuples(index=False))) == exp


def test_evaluate_bm25_known_values(built_index):
    """Metric sanity on constructed cases: a query whose top hit is
    relevant scores mrr=1; an unknown term scores zeros; metrics bounded
    in [0, 1]."""
    from nadry_search_engine_be_ray.pipelines.query import (
        NDCG_DISCOUNTS,
        evaluate_bm25,
    )

    out = evaluate_bm25(
        built_index, ["search", "zzzznotaterm", "search engine"]
    ).to_pandas().set_index("query")
    # single-term query: every candidate is relevant -> mrr = ndcg = 1
    row = out.loc["search"]
    assert row["mrr"] == 1.0 and row["ndcg"] == 1.0
    assert 0 < row["recall"] <= 1.0
    row = out.loc["zzzznotaterm"]
    assert row["n_rel"] == 0 and row["mrr"] == 0 and row["ndcg"] == 0
    row = out.loc["search engine"]
    assert 0 <= row["mrr"] <= 1 and 0 <= row["ndcg"] <= 1
    assert abs(NDCG_DISCOUNTS[0] - 1.0) < 1e-12


def test_spell_correct_kgram_equals_stream_path(built_index):
    """The gram-pruned spell path is DEFINED to answer identically to the
    stream scan (VERDICT r4 #7): same words, same (query, suggestion,
    distance, df) rows — including short words that fall back and words
    with no in-range candidate."""
    from nadry_search_engine_be_ray.pipelines.query import (
        spell_correct, spell_correct_kgram,
    )

    words = ["serch", "documnt", "nosuchwordatall", "engin",
             "ab",          # |set(G(w))| - k*d <= 0 -> stream fallback
             "tokken", "indx"]
    stream = spell_correct(built_index, words, max_distance=2)
    pruned = spell_correct_kgram(built_index, words, max_distance=2)
    assert pruned.to_pylist() == stream.to_pylist()
    # distance-1 budget exercises a different threshold
    s1 = spell_correct(built_index, words, max_distance=1)
    p1 = spell_correct_kgram(built_index, words, max_distance=1)
    assert p1.to_pylist() == s1.to_pylist()


def test_prefix_suggest_kgram_equals_stream_path(built_index):
    """The gram-pruned autocomplete answers identically to the stream
    scan, including sub-gram-length prefixes (dictionary fallback) and
    no-match prefixes."""
    import pytest

    from nadry_search_engine_be_ray.pipelines.query import (
        prefix_suggest, prefix_suggest_kgram,
    )

    prefixes = ["se", "ind", "tok", "i", "zzqx"]
    stream = prefix_suggest(built_index, prefixes, k=5)
    pruned = prefix_suggest_kgram(built_index, prefixes, k=5)
    assert pruned.to_pylist() == stream.to_pylist()
    s3 = prefix_suggest(built_index, prefixes, k=3)
    p3 = prefix_suggest_kgram(built_index, prefixes, k=3)
    assert p3.to_pylist() == s3.to_pylist()
    with pytest.raises(ValueError, match="literal"):
        prefix_suggest_kgram(built_index, ["se%"], k=3)

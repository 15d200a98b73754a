"""Hand-computed goldens for the reference ranking arithmetic and oracle.

The RankerApplication smoke example (nadry/ranker/RankerApplication.java:9-38)
uses query bag {item:1, order:1, arrive:1} against one document with
tf {item:12, order:12}; values below are hand-derived from Ranker.java math.
"""

import math

import pyarrow as pa

from nadry_search_engine_be_ray.functions.scoring import (
    Candidate,
    jdiv,
    jmax,
    paginate,
    rank,
)
from nadry_search_engine_be_ray.oracle import OracleIndex, pagerank_reference


def test_jdiv_java_semantics():
    assert math.isnan(jdiv(0.0, 0.0))
    assert jdiv(1.0, 0.0) == math.inf
    assert jdiv(-1.0, 0.0) == -math.inf
    assert jdiv(6.0, 3.0) == 2.0


def test_jmax_nan_poisons():
    assert math.isnan(jmax(0.0, math.nan))
    assert jmax(1.0, 2.0) == 2.0


def test_ranker_application_example():
    query_bag = {"item": 1, "order": 1, "arrive": 1}
    doc = Candidate(doc_id="d1", url="u1", tf={"item": 12, "order": 12},
                    total_words=24, popularity=0.0)
    ranked = rank(query_bag, [doc])
    c = ranked[0]
    # N=1, df(item)=df(order)=1, df(arrive)=0
    # q_item = (1/3)*log10(1/2); d_item = (12/24)*log10(1/2)
    q = (1 / 3) * math.log10(0.5)
    d = (12 / 24) * math.log10(0.5)
    raw = q * d + q * d
    assert raw > 0
    # relevance normalized by max -> exactly 1.0
    assert c.relevance == 1.0
    # popularity 0/max(0) -> NaN; total = 0.7*1 + 0.3*NaN -> NaN (Java parity)
    assert math.isnan(c.popularity)
    assert math.isnan(c.score)


def test_rank_deterministic_tiebreak_and_nan_first():
    # two docs with identical tf -> identical score; NaN-scored doc sorts first
    q = {"alpha": 1}
    docs = [
        Candidate("b", "ub", {"alpha": 2}, total_words=10, popularity=0.5),
        Candidate("a", "ua", {"alpha": 2}, total_words=10, popularity=0.5),
        Candidate("c", "uc", {"beta": 1}, total_words=0, popularity=0.5),
    ]
    ranked = rank(q, docs)
    ids = [c.doc_id for c in ranked]
    # a and b tie -> doc_id asc between them
    assert ids.index("a") < ids.index("b")


def test_paginate_reference_semantics():
    rows = list(range(25))
    assert paginate(rows, 0, 10) == list(range(10))
    assert paginate(rows, 2, 10) == list(range(20, 25))
    assert paginate(rows, 99, 10) == []
    assert paginate(rows, -5, 0) == list(range(10))  # defaults page 0 size 10


def _tiny_corpus() -> pa.Table:
    rows = [
        ("org/a", "src/item.py", "c1", "python",
         "// item order shipping\nitem order arrived late item\nthe order was num 42"),
        ("org/a", "src/other.py", "c2", "python",
         "// misc things\nsearch engine index builds fast\nitem appears once"),
        ("org/b", "doc/readme.md", "c3", "markdown",
         "# title words here\norder order order arrived\nnothing else"),
    ]
    return pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array([r[2] for r in rows]),
            "lang": pa.array([r[3] for r in rows]),
            "content": pa.array([r[4] for r in rows]),
        }
    )


def test_oracle_index_positions_and_weights():
    idx = OracleIndex()
    idx.add_corpus(_tiny_corpus())
    # 'item' is in doc1 (title? no - path has no 'item'... path 'src/item.py'
    # does contain it) -> appears in TITLE (path), DESCRIPTION (comment) and BODY
    postings = idx.get_postings("item")
    assert postings, "term 'item' must be indexed"
    by_url = {p.url: p for p in postings}
    p1 = by_url["org/a/src/item.py@c1"]
    # TITLE text = path 'src/item.py' -> tokens [src, item, py] -> positions [1]
    assert p1.field_positions[0] == [1]
    # weight = tf_title*3.0 + tf_desc*1.5 + tf_body*1.0
    tf_title = len(p1.field_positions.get(0, []))
    tf_desc = len(p1.field_positions.get(1, []))
    tf_body = len(p1.field_positions.get(2, []))
    assert p1.weight == tf_title * 3.0 + tf_desc * 1.5 + tf_body * 1.0
    assert tf_body >= 3  # 'item' occurs >= 3x in the body text


def test_oracle_search_and_phrase():
    idx = OracleIndex()
    idx.add_corpus(_tiny_corpus())
    res = idx.search("item order arrived")
    assert res["total_results"] >= 2
    top_urls = [r["url"] for r in res["results"]]
    assert "org/a/src/item.py@c1" in top_urls

    # exact phrase only matches docs with adjacent tokens in the same field
    ph = idx.phrase_search('"item order arrived"')
    # body of doc1: 'item order arrived late item' -> match
    assert any(r["url"] == "org/a/src/item.py@c1" for r in ph["results"])
    # doc3 has 'order ... arrived' but never 'item order arrived'
    assert not any(r["url"].endswith("readme.md@c3") for r in ph["results"])

    # all-stop-words query -> empty
    assert idx.search("the a an of")["total_results"] == 0

    # single-surviving-token phrase delegates to term search
    one = idx.phrase_search('"the search"')
    direct = idx.search("search")
    assert [r["doc_id"] for r in one["results"]] == [
        r["doc_id"] for r in direct["results"]
    ]


def test_pagerank_quirk_recurrence():
    # cycle a->b->c->a plus d->a (d has no in-links: contributions from d are
    # skipped); graph keys = {a,b,c} (targets only)
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")]
    urls = {"a", "b", "c", "d"}
    ranks = pagerank_reference(edges, urls)
    assert set(ranks) == {"a", "b", "c"}
    # graph (keyed by target): a:[c,d], b:[a], c:[b]; d skipped (no in-links)
    # quirk divisors are IN-degrees: |in(a)|=2, |in(b)|=1, |in(c)|=1
    n = 3
    ra = rb = rc = 1 / n
    for _ in range(100):
        na = (1 - 0.85) / n + 0.85 * (rc / 1)          # from c (d skipped)
        nb = (1 - 0.85) / n + 0.85 * (ra / 2)          # from a, divisor |in(a)|=2
        nc = (1 - 0.85) / n + 0.85 * (rb / 1)          # from b
        diff = abs(na - ra) + abs(nb - rb) + abs(nc - rc)
        ra, rb, rc = na, nb, nc
        if diff < 1e-6:
            break
    assert abs(ranks["a"] - ra) < 1e-12
    assert abs(ranks["b"] - rb) < 1e-12
    assert abs(ranks["c"] - rc) < 1e-12

    # asymmetric case exercising the in-degree quirk:
    # edges: a->c, b->c, c->a  => graph: c:[a,b], a:[c]
    edges2 = [("a", "c"), ("b", "c"), ("c", "a")]
    r2 = pagerank_reference(edges2, {"a", "b", "c"})
    assert set(r2) == {"a", "c"}
    # quirk: contribution of a to c divides by IN-degree(a)=1 (true out-degree
    # of a is 1 too here); contribution of c to a divides by IN-degree(c)=2
    # though c's true out-degree is 1 -> a gets rank(c)/2, not rank(c)
    n = 2
    ra, rc = 1 / n, 1 / n
    for _ in range(100):
        na = (1 - 0.85) / n + 0.85 * (rc / 2)   # quirk divisor: |in(c)| = 2
        nc = (1 - 0.85) / n + 0.85 * (ra / 1)   # b skipped (no in-links)
        if abs(na - ra) + abs(nc - rc) < 1e-6:
            ra, rc = na, nc
            break
        ra, rc = na, nc
    assert abs(r2["a"] - ra) < 1e-9
    assert abs(r2["c"] - rc) < 1e-9

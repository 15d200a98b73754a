"""rank_fast (vectorized) vs rank (scalar transcription): bit-identical
scores and identical order across randomized candidate sets, including the
NaN / inf normalization edge cases."""

import math

import numpy as np
import pytest

from nadry_search_engine_be_ray.functions.scoring import Candidate, rank, rank_fast


def _run_both(query_bag, docs, tws, pops, term_postings):
    order, score, rel, pop_n = rank_fast(
        query_bag, np.array(docs), np.array(tws), np.array(pops), term_postings
    )
    cands = []
    for i, d in enumerate(docs):
        tf = {}
        for t, (idx, tfa) in term_postings.items():
            where = np.flatnonzero(np.asarray(idx) == i)
            if where.size:
                tf[t] = int(np.asarray(tfa)[where[0]])
        cands.append(
            Candidate(doc_id=f"{d:015x}", url="", tf=tf,
                      total_words=int(tws[i]), popularity=float(pops[i]))
        )
    ranked = rank(query_bag, cands)
    return (order, score), ranked


def _assert_match(fast, ranked, docs):
    order, score = fast
    assert [f"{docs[i]:015x}" for i in order] == [c.doc_id for c in ranked]
    by_doc = {c.doc_id: c.score for c in ranked}
    for i in order:
        a, b = float(score[i]), by_doc[f"{docs[i]:015x}"]
        if math.isnan(b):
            assert math.isnan(a)
        else:
            assert a == b  # bit-identical


@pytest.mark.parametrize("seed", range(10))
def test_randomized(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 40))
    docs = np.sort(rng.choice(10_000, size=n, replace=False)).tolist()
    tws = rng.integers(0, 200, size=n).tolist()      # includes tw=0 edge
    pops = np.where(rng.random(n) < 0.3, 0.0, rng.random(n)).tolist()
    terms = [f"t{j}" for j in range(int(rng.integers(1, 5)))]
    query_bag = {t: int(rng.integers(1, 3)) for t in terms}
    term_postings = {}
    for t in terms:
        m = int(rng.integers(1, n + 1))
        idx = np.sort(rng.choice(n, size=m, replace=False))
        tf = rng.integers(1, 9, size=m)
        term_postings[t] = (idx, tf)
    fast, ranked = _run_both(query_bag, docs, tws, pops, term_postings)
    _assert_match(fast, ranked, docs)


def test_all_zero_popularity_nan_path():
    docs, tws, pops = [1, 2], [10, 10], [0.0, 0.0]
    tp = {"x": (np.array([0, 1]), np.array([2, 3]))}
    fast, ranked = _run_both({"x": 1}, docs, tws, pops, tp)
    _assert_match(fast, ranked, docs)
    assert all(math.isnan(c.score) for c in ranked)


def test_zero_total_words_inf_path():
    docs, tws, pops = [1, 2, 3], [0, 10, 10], [0.5, 0.25, 0.125]
    tp = {"x": (np.array([0, 1]), np.array([1, 1])),
          "y": (np.array([1, 2]), np.array([2, 2]))}
    fast, ranked = _run_both({"x": 1, "y": 1}, docs, tws, pops, tp)
    _assert_match(fast, ranked, docs)

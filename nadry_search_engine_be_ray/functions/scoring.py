"""Exact transcription of the reference ranking arithmetic.

This module is the single source of truth for per-query scoring: BOTH the
distributed engine (pipelines/query.py) and the single-process oracle
(oracle.py) call these functions, so rank/score parity between them reduces
to producing identical candidate sets — which is exactly what the
conformance suite checks.

Semantics transcribed from nadry/ranker/Ranker.java:25-162 including its
quirks (SURVEY.md §2.11):

* candidate-set-relative stats: N = candidate count, df over candidates only
  (Ranker.java:78-90)
* tfidf = (tf / docLength) * log10(N / (1 + df)) (Ranker.java:122-137)
* relevance = RAW dot product (cosine normalization is computed but commented
  out, Ranker.java:142-153)
* relevance normalized by max over candidates (Ranker.java:115) and
  popularity normalized by its max (Ranker.java:67-71) — both with Java
  IEEE-754 division semantics (x/0 -> ±inf, 0/0 -> NaN), reproduced by
  :func:`jdiv`
* blend totalScore = 0.7*relevance + 0.3*popularity (Ranker.java:42)
* sort by totalScore descending with Double.compare semantics (NaN sorts
  as the LARGEST value).  Reference ties are HashMap-order-dependent
  (SURVEY.md §7.4.2); we declare the deterministic tiebreak doc_id asc.

Iteration order is declared deterministic (terms sorted, docs sorted by
doc_id) so floating-point accumulation order is reproducible.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


def jdiv(a: float, b: float) -> float:
    """Java double division: IEEE-754, never raises."""
    if b == 0.0:
        if a == 0.0 or math.isnan(a):
            return math.nan
        neg = (a < 0.0) != (math.copysign(1.0, b) < 0.0)
        return -math.inf if neg else math.inf
    return a / b


def jmax(a: float, b: float) -> float:
    """Java Math.max: NaN-poisoning (Math.max(x, NaN) == NaN)."""
    if math.isnan(a) or math.isnan(b):
        return math.nan
    return a if a > b else b


@dataclass
class Candidate:
    doc_id: str
    url: str
    tf: dict[str, int]            # term -> frequency (total across fields)
    total_words: int = 0          # DocumentData.totalWords; 0 when missing
    popularity: float = 0.0       # raw popularity_score before normalization
    relevance: float = field(default=0.0, init=False)
    score: float = field(default=0.0, init=False)


def calculate_tfidf(
    bag: dict[str, int], doc_length: int, doc_freq: dict[str, int], n_docs: int
) -> dict[str, float]:
    """Ranker.calculateTFIDF (Ranker.java:122-137)."""
    out: dict[str, float] = {}
    for term in sorted(bag):
        tf = bag[term]
        df = doc_freq.get(term, 0)
        idf = math.log10(n_docs / (1 + df))
        out[term] = jdiv(float(tf), float(doc_length)) * idf
    return out


def _dot(query_tfidf: dict[str, float], doc_tfidf: dict[str, float]) -> float:
    """Raw dot product (Ranker.java:142-153; normalization commented out)."""
    s = 0.0
    for term in sorted(query_tfidf):
        if term in doc_tfidf:
            s += query_tfidf[term] * doc_tfidf[term]
    return s


def rank(query_bag: dict[str, int], candidates: list[Candidate]) -> list[Candidate]:
    """Ranker.Rank (Ranker.java:25-65) over an enriched candidate list."""
    if not candidates:
        return []
    candidates = sorted(candidates, key=lambda c: c.doc_id)

    # NormlizePopularityScore (Ranker.java:67-71)
    max_pop = 0.0
    for c in candidates:
        max_pop = jmax(max_pop, c.popularity)
    for c in candidates:
        c.popularity = jdiv(c.popularity, max_pop)

    # CalculateRelevenceScore (Ranker.java:77-117)
    n = len(candidates)
    query_length = sum(query_bag.values())
    doc_freq: dict[str, int] = {}
    for c in candidates:
        for term in c.tf:
            doc_freq[term] = doc_freq.get(term, 0) + 1

    query_tfidf = calculate_tfidf(query_bag, query_length, doc_freq, n)

    raw_scores: list[float] = []
    max_score = 0.0
    for c in candidates:
        doc_tfidf = calculate_tfidf(c.tf, c.total_words, doc_freq, n)
        rel = _dot(query_tfidf, doc_tfidf)
        max_score = jmax(max_score, rel)  # Math.max NaN-poisons (Ranker.java:111)
        raw_scores.append(rel)
    scores = [jdiv(s, max_score) for s in raw_scores]

    for c, rel in zip(candidates, scores):
        c.relevance = rel
        c.score = rel * 0.7 + c.popularity * 0.3

    candidates.sort(key=lambda c: sort_key(c.score, c.doc_id))
    return candidates


def rank_fast(
    query_bag: dict[str, int],
    doc_ints,
    total_words,
    popularity,
    term_postings: dict[str, tuple],
):
    """Vectorized ``rank()`` with IDENTICAL floating-point semantics.

    Inputs: candidate ``doc_ints`` sorted ascending (the doc_id-order
    declared tiebreak), per-candidate ``total_words`` / ``popularity``
    aligned arrays, and per-term ``(cand_idx, tf)`` arrays (``cand_idx``
    indexes into the candidate arrays).  Accumulation runs in sorted-term
    order and candidate order, matching the scalar implementation's declared
    deterministic iteration exactly — the conformance suite asserts
    bit-identical scores between this path, the scalar path, and the oracle.

    Returns (order, score, relevance, pop_norm) numpy arrays; ``order`` is
    the Double.compare-descending ranking (NaN first, doc_int asc ties).
    """
    import numpy as np

    n = int(len(doc_ints))
    if n == 0:
        return (np.empty(0, np.int64),) * 4
    doc_ints = np.asarray(doc_ints)
    tw = np.asarray(total_words, dtype=np.float64)
    pop = np.asarray(popularity, dtype=np.float64)

    def _div_by_zero(x: "np.ndarray") -> "np.ndarray":
        # vectorized jdiv(x, 0.0): 0/0 -> NaN, ±x/0 -> ±inf
        out = np.full(x.size, math.nan)
        out[x > 0] = math.inf
        out[x < 0] = -math.inf
        return out

    with np.errstate(divide="ignore", invalid="ignore"):
        # NormlizePopularityScore: x / max(0, max(pop)) with IEEE semantics
        max_pop = jmax(0.0, float(np.max(pop)) if not np.isnan(pop).any() else math.nan)
        pop_norm = pop / max_pop if max_pop != 0.0 else _div_by_zero(pop)

        query_length = float(sum(query_bag.values()))
        rel = np.zeros(n, dtype=np.float64)
        for term in sorted(query_bag):
            entry = term_postings.get(term)
            if entry is None:
                continue
            idx, tf = entry
            idx = np.asarray(idx, dtype=np.int64)
            tf = np.asarray(tf, dtype=np.float64)
            df = idx.size  # df over candidates (every posting doc IS a candidate)
            idf = math.log10(n / (1 + df))
            q_t = (query_bag[term] / query_length) * idf
            d_t = (tf / tw[idx]) * idf
            rel[idx] += q_t * d_t

        # maxScore: Math.max chain from 0.0, NaN-poisoning
        if np.isnan(rel).any():
            max_score = math.nan
        else:
            max_score = jmax(0.0, float(rel.max()))
        if max_score != 0.0:
            scores_rel = rel / max_score
        else:
            scores_rel = _div_by_zero(rel)

        score = scores_rel * 0.7 + pop_norm * 0.3

    nan_flag = np.where(np.isnan(score), 0, 1)
    neg = np.where(np.isnan(score), 0.0, -score)
    order = np.lexsort((doc_ints, neg, nan_flag))
    return order, score, scores_rel, pop_norm


def sort_key(score: float, doc_id: str):
    """Double.compare-descending key: NaN first, then score desc, doc_id asc."""
    if math.isnan(score):
        return (0, 0.0, doc_id)
    return (1, -score, doc_id)


def paginate(rows: list, page: int, page_size: int) -> list:
    """SearchWrapper.paginateResults (SearchWrapper.java:649-666)."""
    if page < 0:
        page = 0
    if page_size <= 0:
        page_size = 10
    start = page * page_size
    if start >= len(rows):
        return []
    return rows[start : min(start + page_size, len(rows))]

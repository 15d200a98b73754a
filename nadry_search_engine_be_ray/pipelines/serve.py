"""Batch + sharded query serving.

Reference analog: the Spring request path (SearchController.java:53-120) —
reexpressed Ray-Data-first, two layers:

* ``batch_search``: a Dataset of query rows flows through
  ``map_batches(QueryEvalActor, concurrency=N)`` where each actor holds a
  full ``SearchEngine`` (segments mmap'd + doc stats) built ONCE in
  ``__init__`` (T5: state loaded once per worker).  Per-query math is
  byte-identical to the single-query path because both call the same
  SearchEngine.
* ``ShardedSearchEngine``: the MULTI-NODE serving design made concrete —
  one ``ShardSegmentActor`` per segment shard (each holding a page-lazy
  SegmentReader for ONLY its shard, S9/S10 as a shared mutable-cache
  service), with the query layer scattering a query's terms to their
  ``term_shard`` owners in parallel and gathering decoded postings
  (numpy arrays ride the object store zero-copy).  Scoring runs on the
  gather side with the SAME SearchEngine arithmetic, so results are
  identical to the single-process engine (tested).  On one box the
  actors share the page cache; on a cluster they pin shards to nodes.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.tokenize import term_shard
from ..state.segments import PostingList
from .query import SearchEngine


class QueryEvalActor:
    def __init__(self, index_dir: str, mode: str = "reference"):
        self.engine = SearchEngine(index_dir)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        queries = batch["query"].to_pylist()
        pages = batch["page"].to_pylist() if "page" in batch.column_names else [0] * len(queries)
        sizes = (
            batch["page_size"].to_pylist()
            if "page_size" in batch.column_names
            else [10] * len(queries)
        )
        out_q, out_rank, out_doc, out_score, out_total = [], [], [], [], []
        for q, p, s in zip(queries, pages, sizes):
            if self.mode == "reference":
                res = self.engine.search_auto(q, int(p), int(s))
                rows = [(r["doc_id"], r["score"]) for r in res["results"]]
                total = res["total_results"]
            elif self.mode in ("bm25", "bm25f", "bm25plus"):
                # TAAT is the fast path at in-memory posting sizes; WAND wins
                # when lists are disk-resident/huge (kept for that regime and
                # verified equal in tests).  bm25f scores the stored
                # accumulated field weight through the same saturation.
                hits = self.engine.topk_taat(q, k=int(s), scorer=self.mode)
                rows = [(f"{d:015x}", sc) for d, sc in hits]
                total = len(rows)
            else:  # additive
                hits = self.engine.additive_search(q, k=int(s), use_wand=False)
                rows = [(f"{d:015x}", sc) for d, sc in hits]
                total = len(rows)
            for rank_i, (doc, score) in enumerate(rows):
                out_q.append(q)
                out_rank.append(rank_i)
                out_doc.append(doc)
                out_score.append(float(score))
                out_total.append(total)
        return pa.table(
            {
                "query": pa.array(out_q, pa.string()),
                "rank": pa.array(out_rank, pa.int32()),
                "doc_id": pa.array(out_doc, pa.string()),
                "score": pa.array(out_score, pa.float64()),
                "total_results": pa.array(out_total, pa.int64()),
            }
        )


def batch_search(
    queries_ds: "ray.data.Dataset",
    index_dir: str,
    mode: str = "reference",
    concurrency: int = 2,
    batch_size: int = 16,
) -> "ray.data.Dataset":
    """Evaluate a Dataset of queries against the index with an actor pool."""
    return queries_ds.map_batches(
        QueryEvalActor,
        fn_constructor_args=(index_dir, mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class SearchAfterEvalActor:
    """Keyset-pagination evaluator: page 1 (top-k) establishes the cursor,
    page 2 is fetched with SearchEngine.search_after — the deep-pagination
    path whose cost does not grow with the offset."""

    def __init__(self, index_dir: str, k: int = 10, scorer: str = "bm25"):
        self.engine = SearchEngine(index_dir)
        self.k = k
        self.scorer = scorer

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_rank, out_doc, out_score = [], [], [], []
        for q in batch["query"].to_pylist():
            page1 = self.engine.search_after(q, None, k=self.k,
                                             scorer=self.scorer)
            if len(page1) < self.k:
                continue  # no page 2
            cursor = (page1[-1][1], page1[-1][0])  # (score, doc_int)
            page2 = self.engine.search_after(q, cursor, k=self.k,
                                             scorer=self.scorer)
            for i, (d, s) in enumerate(page2):
                out_q.append(q)
                out_rank.append(self.k + i)
                out_doc.append(f"{d:015x}")
                out_score.append(float(s))
        return pa.table(
            {"query": pa.array(out_q, pa.string()),
             "rank": pa.array(out_rank, pa.int32()),
             "doc_id": pa.array(out_doc, pa.string()),
             "score": pa.array(out_score, pa.float64())}
        )


class CollapseEvalActor:
    """Field-collapsed search (Lucene/ES collapse, web-search site
    collapsing): at most one result per ``group_col`` value, best doc per
    group by (score DESC, doc_int ASC), then global top-k over the group
    winners.

    The doc -> group mapping is the doc-values analog: a sorted doc_int
    array + dictionary-coded group ids loaded ONCE per actor from the
    index's prepped table (12 B/doc; at 100 TB this column is loaded per
    index shard by the sharded serve path, not the whole corpus per
    actor)."""

    def __init__(self, index_dir: str, group_col: str = "repo",
                 k: int = 10, scorer: str = "bm25"):
        import pyarrow.dataset as pads

        self.engine = SearchEngine(index_dir)
        self.k = k
        self.scorer = scorer
        t = pads.dataset(
            os.path.join(index_dir, "prepped"), format="parquet"
        ).to_table(columns=["doc_int", group_col])
        di = t["doc_int"].to_numpy(zero_copy_only=False).astype(np.int64)
        de = t[group_col].combine_chunks().dictionary_encode()
        order = np.argsort(di, kind="stable")
        self.doc_ints = di[order]
        self.codes = de.indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)[order]
        self.group_names = de.dictionary.to_pylist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_rank, out_doc, out_group, out_score = [], [], [], [], []
        for q in batch["query"].to_pylist():
            docs, acc = self.engine.all_scores(q, self.scorer)
            if not docs.size:
                continue
            codes = self.codes[np.searchsorted(self.doc_ints, docs)]
            order = np.lexsort((docs, -acc))
            # first occurrence of each group in rank order = group winner
            _, first = np.unique(codes[order], return_index=True)
            win = order[np.sort(first)][: self.k]
            for i, j in enumerate(win):
                out_q.append(q)
                out_rank.append(i)
                out_doc.append(f"{int(docs[j]):015x}")
                out_group.append(self.group_names[int(codes[j])])
                out_score.append(float(acc[j]))
        return pa.table(
            {"query": pa.array(out_q, pa.string()),
             "rank": pa.array(out_rank, pa.int32()),
             "doc_id": pa.array(out_doc, pa.string()),
             "group": pa.array(out_group, pa.string()),
             "score": pa.array(out_score, pa.float64())}
        )


class RocchioEvalActor:
    """Pseudo-relevance feedback (Rocchio, SMART retrieval): take the
    top-``r`` BM25 hits as pseudo-relevant, pick the ``e`` most
    representative NEW terms from their term vectors — INTEGER-ONLY
    selection (tf-sum DESC, df ASC, term ASC), the more_like_this recipe,
    so the SQL oracle reproduces it without float-log hazards — and
    re-score with the expanded weighted query (original multiplicities at
    weight 1.0, expansion terms at ``beta``).

    Term vectors come from the build's postings-phase parquet via doc_int
    predicate pushdown (Lucene's stored term vectors analog); at 100 TB
    this is a forward-index point lookup per feedback doc, never a scan.
    """

    def __init__(self, index_dir: str, r: int = 5, e: int = 3,
                 beta: float = 0.5):
        self.engine = SearchEngine(index_dir)
        self.index_dir = index_dir
        self.r, self.e, self.beta = r, e, beta

    def _expansion_terms(self, fb_docs: np.ndarray,
                         exclude: set[str]) -> list[str]:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        tv = pads.dataset(
            os.path.join(self.index_dir, "postings"), format="parquet",
            partitioning="hive",
        ).to_table(
            columns=["term", "doc_int", "field", "tf"],
            filter=pc.field("doc_int").isin(fb_docs.tolist())
            & (pc.field("field") >= 0),
        )
        if tv.num_rows == 0:
            return []
        agg = tv.group_by("term").aggregate([("tf", "sum")])
        terms = agg["term"].to_pylist()
        tfs = agg["tf_sum"].to_pylist()
        cand = [(t, tf) for t, tf in zip(terms, tfs) if t not in exclude]
        scored = sorted(
            ((-tf, self.engine.reader.postings(t).df_stale, t)
             for t, tf in cand)
        )[: self.e]
        return [t for _, _, t in scored]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_q, out_rank, out_doc, out_score = [], [], [], []
        for q in batch["query"].to_pylist():
            docs, acc = self.engine.all_scores(q, "bm25")
            if not docs.size:
                continue
            order = np.lexsort((docs, -acc))[: self.r]
            fb_docs = docs[order]
            tokens = self.engine.tokenizer.tokenize(q)
            weights = {t: float(m) for t, m in Counter(tokens).items()}
            for t in self._expansion_terms(fb_docs, set(tokens)):
                weights[t] = self.beta
            rdocs, racc = self.engine.all_scores_weighted(weights, "bm25")
            ro = np.lexsort((rdocs, -racc))[:10]
            for i, j in enumerate(ro):
                out_q.append(q)
                out_rank.append(i)
                out_doc.append(f"{int(rdocs[j]):015x}")
                out_score.append(float(racc[j]))
        return pa.table(
            {"query": pa.array(out_q, pa.string()),
             "rank": pa.array(out_rank, pa.int32()),
             "doc_id": pa.array(out_doc, pa.string()),
             "score": pa.array(out_score, pa.float64())}
        )


def expand_with_synonyms(tokens: list[str], syn: dict[str, list[str]],
                         gamma: float) -> dict[str, float]:
    """Weighted term multiset for a synonym-expanded query: original
    multiplicities at 1.0 plus ``gamma`` * multiplicity for each synonym
    of each token (weights merge when a synonym collides with another
    query term) — deterministic, shared verbatim by the SQL-oracle
    generator."""
    from collections import Counter

    weights = {t: float(m) for t, m in Counter(tokens).items()}
    for t, m in sorted(Counter(tokens).items()):
        for s in syn.get(t, []):
            weights[s] = weights.get(s, 0.0) + gamma * m
    return weights


def stem_thesaurus(thesaurus: dict[str, list[str]], tokenizer) \
        -> dict[str, list[str]]:
    """RAW-word thesaurus -> stemmed term mapping via the engine's own
    tokenizer (single-token entries only; stopword-stemmed entries drop
    out naturally)."""
    syn: dict[str, list[str]] = {}
    for base, syns in sorted(thesaurus.items()):
        bts = tokenizer.tokenize(base)
        if len(bts) != 1:
            continue
        out = []
        for s in syns:
            sts = tokenizer.tokenize(s)
            if len(sts) == 1 and sts[0] != bts[0]:
                out.append(sts[0])
        if out:
            syn.setdefault(bts[0], []).extend(sorted(out))
    return syn


class SynonymEvalActor:
    """Query-time synonym expansion (Lucene SynonymGraphFilter analog):
    each query term ORs in its thesaurus synonyms at a discounted weight
    ``gamma``, scored through the weighted BM25 accumulator.  The stemmed
    mapping is built once per actor; expansion itself is a pure dict
    rewrite — no extra index structure."""

    def __init__(self, index_dir: str, thesaurus: dict | None = None,
                 gamma: float = 0.4):
        from ..sources.corpus import QUERY_THESAURUS

        self.engine = SearchEngine(index_dir)
        self.syn = stem_thesaurus(
            thesaurus if thesaurus is not None else QUERY_THESAURUS,
            self.engine.tokenizer,
        )
        self.gamma = gamma

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_rank, out_doc, out_score = [], [], [], []
        for q in batch["query"].to_pylist():
            tokens = self.engine.tokenizer.tokenize(q)
            if not tokens:
                continue
            weights = expand_with_synonyms(tokens, self.syn, self.gamma)
            docs, acc = self.engine.all_scores_weighted(weights, "bm25")
            if not docs.size:
                continue
            order = np.lexsort((docs, -acc))[:10]
            for i, j in enumerate(order):
                out_q.append(q)
                out_rank.append(i)
                out_doc.append(f"{int(docs[j]):015x}")
                out_score.append(float(acc[j]))
        return pa.table(
            {"query": pa.array(out_q, pa.string()),
             "rank": pa.array(out_rank, pa.int32()),
             "doc_id": pa.array(out_doc, pa.string()),
             "score": pa.array(out_score, pa.float64())}
        )


class FieldSearchEvalActor:
    """Fielded search (Lucene ``title:term``): BM25 over the tf of ONE
    field only.  The index stores no per-field posting lists — the
    positions payload's field masks double as field storage (the FieldInfo
    analog), so per-field tf is one vectorized flat-decode + bincount per
    posting list: tf_f[doc] = |positions of the term in field f|.  df and
    idf are field-restricted (docs where tf_f > 0); dl stays the whole-doc
    length (documented simple variant — per-field length norms would need
    a per-field doc_stats column).

    100 TB note: a production fielded tier would materialize per-field
    posting lists at build time; this query-time derivation trades one
    positions decode per (term, query) for zero extra index bytes."""

    def __init__(self, index_dir: str, field: int = 0, k: int = 10):
        self.engine = SearchEngine(index_dir)
        self.field = field
        self.k = k

    def _field_postings(self, term: str):
        import math

        from ..functions.codec import decode_doc_positions_flat

        pl = self.engine.reader.postings(term)
        if pl is None or pl.df == 0:
            return None
        dr, f, _ = decode_doc_positions_flat(
            pl.positions_buf, pl.pos_offsets, np.arange(pl.df)
        )
        tf = np.bincount(dr[f == self.field], minlength=pl.df)
        keep = tf > 0
        if not keep.any():
            return None
        docs = pl.docs[keep]
        tff = tf[keep].astype(np.float64)
        n = self.engine.stats["n_docs"]
        idf = math.log((n - docs.size + 0.5) / (docs.size + 0.5) + 1.0)
        return docs, tff, idf

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_rank, out_doc, out_score = [], [], [], []
        avgdl = self.engine.stats["avgdl"] or 1.0
        for q in batch["query"].to_pylist():
            tokens = self.engine.tokenizer.tokenize(q)
            parts = []
            for t in tokens:  # duplicates keep duplicate contribution
                fp = self._field_postings(t)
                if fp is not None:
                    parts.append(fp)
            if not parts:
                continue
            all_docs = np.unique(np.concatenate([d for d, _, _ in parts]))
            acc = np.zeros(all_docs.size, dtype=np.float64)
            for docs, tff, idf in parts:
                tw, _ = self.engine.docs.lookup(docs)
                dl = tw.astype(np.float64)
                # written as (1.2 + 1) / (1 - 0.75 + ...) to stay
                # bit-identical with the SQL oracle's expression tree
                s = idf * (tff * (1.2 + 1)) / (
                    tff + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
                )
                np.add.at(acc, np.searchsorted(all_docs, docs), s)
            order = np.lexsort((all_docs, -acc))[: self.k]
            for i, j in enumerate(order):
                out_q.append(q)
                out_rank.append(i)
                out_doc.append(f"{int(all_docs[j]):015x}")
                out_score.append(float(acc[j]))
        return pa.table(
            {"query": pa.array(out_q, pa.string()),
             "rank": pa.array(out_rank, pa.int32()),
             "doc_id": pa.array(out_doc, pa.string()),
             "score": pa.array(out_score, pa.float64())}
        )


class ExplainEvalActor:
    """Score explanation (Lucene's explain API): for each query's top-n
    BM25 hits, one row per contributing term with the full factor
    breakdown (tf, stale df, idf, saturated tf part, weighted
    contribution) — the rows sum to the hit's score, which the oracle
    recomputes independently term-by-term."""

    def __init__(self, index_dir: str, n_docs: int = 3, k: int = 10):
        self.engine = SearchEngine(index_dir)
        self.n_docs = n_docs
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math
        from collections import Counter

        cols = {c: [] for c in ("query", "doc_id", "term", "tf", "df",
                                "idf", "contribution")}
        n = self.engine.stats["n_docs"]
        avgdl = self.engine.stats["avgdl"] or 1.0
        for q in batch["query"].to_pylist():
            hits = self.engine.topk_taat(q, k=self.n_docs, scorer="bm25")
            if not hits:
                continue
            top_docs = np.array(sorted(d for d, _ in hits), dtype=np.int64)
            tokens = self.engine.tokenizer.tokenize(q)
            for t, m in sorted(Counter(tokens).items()):
                pl = self.engine.reader.postings(t)
                if pl is None:
                    continue
                idf = math.log(
                    (n - pl.df_stale + 0.5) / (pl.df_stale + 0.5) + 1.0
                )
                idx = np.searchsorted(pl.docs, top_docs)
                idx[idx == pl.docs.size] = 0
                hit = pl.docs[idx] == top_docs
                if not hit.any():
                    continue
                docs_h = top_docs[hit]
                tf = pl.tfs[idx[hit]].astype(np.float64)
                tw, _ = self.engine.docs.lookup(docs_h)
                dl = tw.astype(np.float64)
                contrib = float(m) * idf * (tf * (1.2 + 1)) / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
                )
                for j, d in enumerate(docs_h):
                    cols["query"].append(q)
                    cols["doc_id"].append(f"{int(d):015x}")
                    cols["term"].append(t)
                    cols["tf"].append(int(tf[j]))
                    cols["df"].append(int(pl.df_stale))
                    cols["idf"].append(round(idf, 9))
                    cols["contribution"].append(round(float(contrib[j]), 9))
        return pa.table(
            {"query": pa.array(cols["query"], pa.string()),
             "doc_id": pa.array(cols["doc_id"], pa.string()),
             "term": pa.array(cols["term"], pa.string()),
             "tf": pa.array(cols["tf"], pa.int64()),
             "df": pa.array(cols["df"], pa.int64()),
             "idf": pa.array(cols["idf"], pa.float64()),
             "contribution": pa.array(cols["contribution"], pa.float64())}
        )


def _make_shard_actor():
    import ray

    @ray.remote
    class ShardSegmentActor:
        """Owns ONE shard's page-lazy SegmentReader; serves decoded posting
        arrays for term batches (the per-shard posting service of the
        scatter/gather design)."""

        def __init__(self, index_dir: str, shard: int):
            from ..state.segments import SegmentReader

            self.reader = SegmentReader(index_dir, shards=[shard])

        def fetch(self, terms: list[str]):
            out = []
            for t in terms:
                pl = self.reader.postings(t)
                if pl is None:
                    out.append((t, None))
                else:
                    # df_total rides along so stale-df scoring semantics
                    # (tombstone deletes, state/deletes.py) survive the
                    # scatter/gather hop
                    out.append(
                        (t, (pl.docs, pl.tfs, pl.weights, pl.block_max,
                             pl.positions_buf, pl.pos_offsets,
                             pl.df_total))
                    )
            return out

    return ShardSegmentActor


class _ShardScatterReader:
    """SegmentReader-compatible facade that scatters term lookups to the
    per-shard actors and caches gathered postings.  ``prefetch`` fans one
    query's terms out in parallel; stray ``postings`` calls fall back to a
    single synchronous fetch."""

    def __init__(self, index_dir: str, num_shards: int, actors: dict):
        self.index_dir = index_dir
        self.num_shards = num_shards
        self.actors = actors
        self._cache: dict[str, PostingList | None] = {}

    def shard_for(self, term: str) -> int:
        return term_shard(term, self.num_shards)

    def prefetch(self, terms: list[str]) -> None:
        import ray

        need = [t for t in set(terms) if t not in self._cache]
        if not need:
            return
        by_shard: dict[int, list[str]] = {}
        for t in need:
            by_shard.setdefault(self.shard_for(t), []).append(t)
        futures = [
            self.actors[s].fetch.remote(ts) for s, ts in by_shard.items()
        ]
        for batch in ray.get(futures):
            for t, payload in batch:
                if payload is None:
                    self._cache[t] = None
                else:
                    docs, tfs, w, bm, pbuf, poff, df_total = payload
                    self._cache[t] = PostingList(
                        term=t, docs=docs, tfs=tfs, weights=w, block_max=bm,
                        positions_buf=pbuf, pos_offsets=poff,
                        df_total=df_total,
                    )

    def postings(self, term: str):
        if term not in self._cache:
            self.prefetch([term])
        return self._cache[term]

    def has_term(self, term: str) -> bool:
        return self.postings(term) is not None


class ShardedSearchEngine(SearchEngine):
    """SearchEngine whose posting reads scatter/gather across per-shard
    actors — the multi-node serving topology, runnable single-node.  All
    scoring arithmetic is inherited, so results match the single-process
    engine exactly."""

    def __init__(self, index_dir: str):
        import os

        import ray

        super().__init__(index_dir, shards=[])   # no local segment state
        with open(os.path.join(index_dir, "stats.json")) as f:
            num_shards = int(json.load(f)["num_shards"])
        Actor = _make_shard_actor()
        actors = {
            s: Actor.remote(index_dir, s) for s in range(num_shards)
        }
        self.reader = _ShardScatterReader(index_dir, num_shards, actors)

    def _prefetch_query(self, query: str) -> None:
        # strip only the quote characters so phrase terms prefetch too
        self.reader.prefetch(self.tokenizer.tokenize((query or "").replace('"', " ")))

    def search(self, query: str, page: int = 0, page_size: int = 10):
        self._prefetch_query(query)
        return super().search(query, page, page_size)

    def phrase_search(self, phrase: str, page: int = 0, page_size: int = 10):
        self._prefetch_query(phrase)
        return super().phrase_search(phrase, page, page_size)

    def search_auto(self, query: str, page: int = 0, page_size: int = 10):
        self._prefetch_query(query)
        return super().search_auto(query, page, page_size)

    def bm25_search(self, query: str, k: int = 10, **kw):
        self._prefetch_query(query)
        return super().bm25_search(query, k=k, **kw)

    def additive_search(self, query: str, k: int = 10, **kw):
        self._prefetch_query(query)
        return super().additive_search(query, k=k, **kw)


def ensure_champion_tier(index_dir: str, m: int = 3) -> str:
    """Build (once, `_DONE`-checkpointed) the champion-list parquet tier
    for ``index_dir`` — per term, the top-``m`` postings by accumulated
    field weight (pipelines/build.champion_lists), written sorted so a
    query's pruned read touches only its terms' row groups.  Called from
    the DRIVER before spawning ChampionEvalActor pools so concurrent
    actors never race the build."""
    import os
    import shutil

    from .build import champion_lists

    champ_dir = os.path.join(index_dir, f"champions_{m}")
    done = os.path.join(champ_dir, "_DONE")
    if not os.path.exists(done):
        shutil.rmtree(champ_dir, ignore_errors=True)
        tbl = champion_lists(index_dir, m=m)
        import pyarrow.parquet as pq

        os.makedirs(champ_dir, exist_ok=True)
        pq.write_table(
            tbl.sort_by([("term", "ascending"), ("w_rank", "ascending")]),
            os.path.join(champ_dir, "champions.parquet"),
            row_group_size=4096,
        )
        with open(done, "w") as f:
            f.write("champion tier")
    return champ_dir


class ChampionEvalActor:
    """Champion-list early-termination retrieval (Manning/Raghavan/
    Schütze IR §7.1.3; Persin-style impact ordering): each query term
    contributes ONLY its top-``m`` postings by accumulated field weight —
    the build-side champion tier — so a query's candidate work is bounded
    by ``len(tokens) × m`` REGARDLESS of posting-list length.  The score
    of a surviving entry is the exact bm25f expression (weight-saturated,
    stale-df idf), i.e. at m → ∞ the ranking equals the engine's bm25f
    mode; at finite m it is the declared inexact-top-k semantics, which
    the driver oracle replays exactly (row_number ≤ m over the dumped
    tokw table), so the approximation is hash-checked, not hand-waved.

    100 TB note: the query path reads the champion parquet with a
    term-pruned row-group read (the tier is sorted by term) and never
    decodes a posting payload; df comes from the dictionary.  Production
    would store df beside the champion rows to avoid the dictionary
    lookup per term."""

    def __init__(self, index_dir: str, m: int = 3, k: int = 10):
        import os

        self.engine = SearchEngine(index_dir)
        self.m = m
        self.k = k
        self.champ_dir = os.path.join(index_dir, f"champions_{m}")
        if not os.path.exists(os.path.join(self.champ_dir, "_DONE")):
            raise RuntimeError(
                "champion tier missing — call ensure_champion_tier() "
                "from the driver first"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        eng = self.engine
        n = eng.stats["n_docs"]
        avgdl = eng.stats["avgdl"] or 1.0
        out_q, out_rank, out_doc, out_score = [], [], [], []
        for q in batch["query"].to_pylist():
            tokens = eng.tokenizer.tokenize(q)
            if not tokens:
                continue
            mult = Counter(tokens)
            tbl = pads.dataset(self.champ_dir, format="parquet").to_table(
                columns=["term", "doc_int", "weight"],
                filter=pc.field("term").isin(
                    pa.array(sorted(mult), pa.string())),
            )
            if tbl.num_rows == 0:
                continue
            terms_col = np.asarray(tbl["term"].to_pylist(), dtype=object)
            docs_col = tbl["doc_int"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            w_col = tbl["weight"].to_numpy(zero_copy_only=False)
            cand = np.unique(docs_col)
            tws, _ = eng.docs.lookup(cand)
            dl = tws.astype(np.float64)
            acc = np.zeros(cand.size, dtype=np.float64)
            for t in sorted(mult):   # fixed term order -> deterministic
                sel = terms_col == t
                if not sel.any():
                    continue
                pl = eng.reader.postings(t)
                df = pl.df_stale if pl is not None else 0
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                idx = np.searchsorted(cand, docs_col[sel])
                w = w_col[sel]
                sat = (w * (1.2 + 1)) / (
                    w + 1.2 * (1 - 0.75 + 0.75 * dl[idx] / avgdl)
                )
                np.add.at(acc, idx, mult[t] * idf * sat)
            order = np.lexsort((cand, -acc))[: self.k]
            for i, j in enumerate(order):
                out_q.append(q)
                out_rank.append(i)
                out_doc.append(f"{int(cand[j]):015x}")
                out_score.append(float(acc[j]))
        return pa.table(
            {"query": pa.array(out_q, pa.string()),
             "rank": pa.array(out_rank, pa.int32()),
             "doc_id": pa.array(out_doc, pa.string()),
             "score": pa.array(out_score, pa.float64())}
        )


class HighlightEvalActor:
    """Match-offset extraction for result highlighting (the Lucene
    UnifiedHighlighter analog; the reference's snippet marker consumes
    exactly this data, SearchWrapper.java:566-638): for each query, the
    engine's BM25 top-``k`` docs, then every (term, field, position)
    occurrence of each query term in each top doc, decoded from the
    positions payload of just the query terms' posting lists — per-query
    work is bounded by tokens × k docs × occurrences, never corpus size.

    Output (query, rank, doc_id, term, field, pos); a top doc missing a
    term (multi-term queries) simply contributes no rows for it."""

    def __init__(self, index_dir: str, k: int = 3):
        self.engine = SearchEngine(index_dir)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        eng = self.engine
        out = {"query": [], "rank": [], "doc_id": [], "term": [],
               "field": [], "pos": []}
        for q in batch["query"].to_pylist():
            docs, acc = eng.all_scores(q, "bm25")
            if not docs.size:
                continue
            order = np.lexsort((docs, -acc))[: self.k]
            top_docs = docs[order]
            for t in sorted(set(eng.tokenizer.tokenize(q))):
                pl = eng.reader.postings(t)
                if pl is None:
                    continue
                idx = np.searchsorted(pl.docs, top_docs)
                idx_c = np.minimum(idx, pl.docs.size - 1)
                hit = pl.docs[idx_c] == top_docs
                for rank in np.flatnonzero(hit):
                    d = int(top_docs[rank])
                    for field, poss in sorted(
                        pl.positions_for(int(idx_c[rank])).items()
                    ):
                        for p_ in poss.tolist():
                            out["query"].append(q)
                            out["rank"].append(int(rank))
                            out["doc_id"].append(f"{d:015x}")
                            out["term"].append(t)
                            out["field"].append(int(field))
                            out["pos"].append(int(p_))
        return pa.table(
            {"query": pa.array(out["query"], pa.string()),
             "rank": pa.array(out["rank"], pa.int32()),
             "doc_id": pa.array(out["doc_id"], pa.string()),
             "term": pa.array(out["term"], pa.string()),
             "field": pa.array(out["field"], pa.int32()),
             "pos": pa.array(out["pos"], pa.int64())}
        )


class TieredEvalActor:
    """Tiered retrieval (IR-book §7.2.1 tiered indexes): tier 1 is the
    champion parquet (per term, top-``m`` postings by field weight); if
    tier 1 yields at least ``k`` DISTINCT candidate docs the query is
    answered from tier 1 alone with the champion scoring (bounded work),
    otherwise it falls back to full bm25f evaluation over the complete
    posting lists — the classic accuracy/latency ladder, with the tier
    choice emitted per row so the oracle hash-checks WHICH tier fired,
    not just the ranking."""

    def __init__(self, index_dir: str, m: int = 3, k: int = 10):
        self.champ = ChampionEvalActor(index_dir, m=m, k=k)
        self.engine = self.champ.engine
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        eng = self.engine
        out = {"query": [], "rank": [], "doc_id": [], "score": [],
               "tier": []}
        for q in batch["query"].to_pylist():
            tokens = eng.tokenizer.tokenize(q)
            if not tokens:
                continue
            terms = sorted(set(tokens))
            t1 = pads.dataset(
                self.champ.champ_dir, format="parquet"
            ).to_table(
                columns=["doc_int"],
                filter=pc.field("term").isin(pa.array(terms, pa.string())),
            )
            n_cand = len(pc.unique(t1["doc_int"].combine_chunks()))
            if n_cand >= self.k:
                one = self.champ(pa.table(
                    {"query": pa.array([q], pa.string())}))
                for r in range(one.num_rows):
                    out["query"].append(q)
                    out["rank"].append(int(one["rank"][r].as_py()))
                    out["doc_id"].append(one["doc_id"][r].as_py())
                    out["score"].append(float(one["score"][r].as_py()))
                    out["tier"].append(1)
            else:   # tier-1 under-filled: full evaluation
                docs, acc = eng.all_scores(q, "bm25f")
                if not docs.size:
                    continue
                order = np.lexsort((docs, -acc))[: self.k]
                for i, j in enumerate(order):
                    out["query"].append(q)
                    out["rank"].append(i)
                    out["doc_id"].append(f"{int(docs[j]):015x}")
                    out["score"].append(float(acc[j]))
                    out["tier"].append(2)
        return pa.table(
            {"query": pa.array(out["query"], pa.string()),
             "rank": pa.array(out["rank"], pa.int32()),
             "doc_id": pa.array(out["doc_id"], pa.string()),
             "score": pa.array(out["score"], pa.float64()),
             "tier": pa.array(out["tier"], pa.int32())}
        )


class MinShouldMatchEvalActor:
    """Minimum-should-match retrieval (the Lucene/ES ``minimum_should_
    match`` parameter): a candidate must match at least ``ceil(ratio ×
    n_distinct_query_terms)`` DISTINCT query terms to be scored; the
    survivors get the full BM25 score over all their matched terms, top-k
    by (score DESC, doc_int ASC).  Kills the low-precision single-term
    tail of OR semantics without AND's recall cliff.

    Per query the distinct-match count is one searchsorted membership
    accumulation over the candidate array (no re-decode: the per-term
    posting arrays are already in hand from scoring)."""

    def __init__(self, index_dir: str, ratio: float = 0.5, k: int = 10):
        self.engine = SearchEngine(index_dir)
        self.ratio = ratio
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        eng = self.engine
        out_q, out_rank, out_doc, out_score, out_nm = [], [], [], [], []
        for q in batch["query"].to_pylist():
            tokens = eng.tokenizer.tokenize(q)
            if not tokens:
                continue
            distinct = sorted(set(tokens))
            required = max(1, math.ceil(self.ratio * len(distinct)))
            docs, acc = eng.all_scores(q, "bm25")
            if not docs.size:
                continue
            nmatch = np.zeros(docs.size, dtype=np.int64)
            for t in distinct:
                pl = eng.reader.postings(t)
                if pl is None:
                    continue
                idx = np.searchsorted(docs, pl.docs)
                idx_c = np.minimum(idx, docs.size - 1)
                hit = docs[idx_c] == pl.docs
                nmatch[idx_c[hit]] += 1
            keep = np.flatnonzero(nmatch >= required)
            if keep.size == 0:
                continue
            order = keep[np.lexsort((docs[keep], -acc[keep]))][: self.k]
            for i, j in enumerate(order):
                out_q.append(q)
                out_rank.append(i)
                out_doc.append(f"{int(docs[j]):015x}")
                out_score.append(float(acc[j]))
                out_nm.append(int(nmatch[j]))
        return pa.table(
            {"query": pa.array(out_q, pa.string()),
             "rank": pa.array(out_rank, pa.int32()),
             "doc_id": pa.array(out_doc, pa.string()),
             "score": pa.array(out_score, pa.float64()),
             "n_matched": pa.array(out_nm, pa.int64())}
        )

"""Batch query evaluation as a stateful actor-pool Dataset stage.

Reference analog: the Spring request path (SearchController.java:53-120) —
reexpressed Ray-Data-first: a Dataset of query rows flows through
``map_batches(QueryEvalActor, concurrency=N)`` where each actor holds a full
``SearchEngine`` (segments mmap'd + doc stats) built ONCE in ``__init__``
(T5: state loaded once per worker).  Per-query math is byte-identical to the
single-query path because both call the same SearchEngine.

At multi-node scale each actor would own a shard subset and a scatter/gather
layer would route terms via ``term_shard``; on one node each actor holds all
shards (they are mmap'd, so the page cache is shared across actors).
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

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
            elif self.mode == "bm25":
                # TAAT is the fast path at in-memory posting sizes; WAND wins
                # when lists are disk-resident/huge (kept for that regime and
                # verified equal in tests)
                hits = self.engine.bm25_search(q, k=int(s), use_wand=False)
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

"""Percolator: reverse search — match a STREAM of documents against a
registry of stored queries (Elasticsearch percolate / Lucene Monitor
analog; the reference has no equivalent — its query path only ever runs
one query against a static index, SearchController.java:53-120).

Ray-Data shape: the stored-query registry is tiny config broadcast via
``ray.put`` once; documents stream through ``map_batches`` and each batch
is matched VECTORIZED — one compiled token-boundary regex pass per
distinct registry term (registry terms ≪ corpus vocabulary), then pure
boolean AND columns per query.  No shuffle, no index, no per-row Python:
the op is a streaming filter suitable for alerting on a 100 TB ingest.

Matching semantics (shared verbatim by the SQL oracle): a document
matches a stored query iff EVERY query term is a member of the document's
token set under the simple tokenizer ``[a-z0-9_]+`` on lowered text —
implemented here as the boundary regex ``(^|[^a-z0-9_])term([^a-z0-9_]|$)``
which is equivalent to token membership for that token class.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_TOKEN_CLASS = "a-z0-9_"


def _boundary_regex(term: str) -> "re.Pattern[str]":
    return re.compile(
        f"(?:^|[^{_TOKEN_CLASS}]){re.escape(term)}(?:[^{_TOKEN_CLASS}]|$)"
    )


class PercolateBatch:
    """map_batches callable: emits one row per (query_id, matching doc)."""

    def __init__(self, stored_queries: dict[str, list[str]],
                 id_col: str = "doc_id", text_col: str = "text"):
        # compile once per actor/worker; registry terms dedup across queries
        self.queries = {
            q: sorted(set(ts)) for q, ts in sorted(stored_queries.items())
        }
        terms = sorted({t for ts in self.queries.values() for t in ts})
        self.patterns = {t: _boundary_regex(t) for t in terms}
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        text = pd.Series(batch[self.text_col].to_pandas()).fillna("").str.lower()
        presence = {
            t: text.str.contains(p).to_numpy(dtype=bool)
            for t, p in self.patterns.items()
        }
        out_q, out_d = [], []
        for q, ts in self.queries.items():
            m = np.ones(len(text), dtype=bool)
            for t in ts:
                m &= presence[t]
            hit = ids[m]
            out_q.extend([q] * hit.size)
            out_d.append(hit)
        docs = (np.concatenate(out_d) if out_d else
                np.empty(0, dtype=np.int64))
        return pa.table(
            {"query_id": pa.array(out_q, pa.string()),
             "doc_id": pa.array(docs.astype(np.int64), pa.int64())}
        )


def percolate(docs_ds, stored_queries: dict[str, list[str]], *,
              id_col: str = "doc_id", text_col: str = "text"):
    """Match every document of ``docs_ds`` against the stored-query
    registry; returns a Dataset of (query_id, doc_id) match rows."""
    return docs_ds.map_batches(
        PercolateBatch(stored_queries, id_col, text_col),
        batch_format="pyarrow",
    )

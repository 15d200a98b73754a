"""SQL-checkable inverted-index mechanics over the ``documents`` testdata.

These mirror the engine's posting-construction machinery (explode -> shuffle
-> aggregate; positional lookup; token adjacency) with a DELIBERATELY simple
tokenizer — ``re.split('[^a-z0-9]+', lower(text))`` — whose semantics DuckDB
reproduces exactly (``string_split_regex``), so the driver's SQL oracle can
hash-compare them.  The REAL tokenizer path (Porter2 + specials) is verified
against the transcribed oracle in pytest; it is not SQL-expressible.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

_SIMPLE = re.compile(r"[^a-z0-9]+")


def simple_tokens(text: str) -> list[str]:
    return _SIMPLE.split((text or "").lower())


def _docs(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _explode(batch: pa.Table, distinct_per_doc: bool) -> pa.Table:
    ids, terms = [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = [t for t in simple_tokens(text) if len(t) >= 2]
        if distinct_per_doc:
            toks = set(toks)
        for t in toks:
            ids.append(did)
            terms.append(t)
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "term": pa.array(terms, pa.string())}
    )


def term_df(sf_dir: str) -> pd.DataFrame:
    """Document frequency per term (the A3/A4 groupby mechanics)."""
    ds = _docs(sf_dir).map_batches(
        lambda b: _explode(b, True), batch_format="pyarrow"
    )
    out = ds.groupby("term").aggregate(Count(alias_name="df")).to_pandas()
    out["df"] = out["df"].astype("int64")
    return out.sort_values("term").reset_index(drop=True)


def top_terms(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k terms by total tf with deterministic (tf desc, term asc) order."""
    ds = _docs(sf_dir).map_batches(
        lambda b: _explode(b, False), batch_format="pyarrow"
    )
    counts = ds.groupby("term").aggregate(Count(alias_name="tf"))
    out = counts.sort(["tf", "term"], descending=[True, False]).limit(k).to_pandas()
    out["tf"] = out["tf"].astype("int64")
    return out.reset_index(drop=True)


def doc_token_count(sf_dir: str) -> pd.DataFrame:
    """Valid-token count per doc (A2 totalWords mechanics)."""

    def count_batch(batch: pa.Table) -> pa.Table:
        ns = [
            sum(1 for t in simple_tokens(text) if len(t) >= 2)
            for text in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pa.array(ns, pa.int64())}
        )

    out = _docs(sf_dir).map_batches(count_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def first_position(sf_dir: str, term: str = "spark") -> pd.DataFrame:
    """0-based first position of ``term`` in the raw split-token list per doc
    (positional-index mechanics; matches DuckDB list_position semantics)."""

    def pos_batch(batch: pa.Table) -> pa.Table:
        ids, poss = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = simple_tokens(text)
            try:
                p = toks.index(term)
            except ValueError:
                continue
            ids.append(did)
            poss.append(p)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "pos": pa.array(poss, pa.int64())}
        )

    out = _docs(sf_dir).map_batches(pos_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def phrase_contains(sf_dir: str, phrase: str = "hash join") -> pd.DataFrame:
    """Docs whose token stream contains the exact adjacent phrase (J2
    adjacency mechanics on the simple token stream)."""
    needle = " " + " ".join(simple_tokens(phrase)) + " "

    def match_batch(batch: pa.Table) -> pa.Table:
        ids = [
            did
            for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist())
            if needle in (" " + " ".join(simple_tokens(text)) + " ")
        ]
        return pa.table({"doc_id": pa.array(ids, pa.int64())})

    out = _docs(sf_dir).map_batches(match_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

"""Percolator (pipelines/percolate.py): stored-query registry matched
against a document stream — boundary-regex token membership must equal
true token-set membership, conjunctive across a query's terms."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from nadry_search_engine_be_ray.pipelines.percolate import (
    PercolateBatch,
    percolate,
)


def test_boundary_regex_equals_token_membership():
    import re

    docs = [
        "slow hash join on the big table",
        "slowest hash joins",            # 'slow'/'join' only as substrings
        "a_slow_token here",             # underscore is a token char
        "JOIN slow HASH upper case",
        "",
    ]
    b = PercolateBatch({"q": ["slow", "join", "hash"]})
    out = b(pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs, pa.string())}))
    got = set(out["doc_id"].to_pylist())
    tok = re.compile(r"[a-z0-9_]+")
    exp = {
        i for i, t in enumerate(docs)
        if {"slow", "join", "hash"} <= set(tok.findall(t.lower()))
    }
    assert got == exp == {0, 3}


def test_percolate_stream(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "customer order merge pipeline",
            "customer order only",
            "merge order customer again customer",
        ], pa.string()),
    }))
    out = percolate(
        docs, {"a": ["customer", "order", "merge"], "b": ["order"]}
    ).to_pandas().sort_values(["query_id", "doc_id"])
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("a", 1), ("a", 3), ("b", 1), ("b", 2), ("b", 3),
    ]

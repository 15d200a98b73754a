"""Tokenize stage: documents -> posting tuples (the map side of the index
build shuffle).

Reference analog: IndexBuilder.indexDocumentField (IndexBuilder.java:126-145)
+ InvertedIndex.addTerm merge (InvertedIndex.java:82-122, 183-214), collapsed
into a single stateful ``map_batches`` stage (T1 in SURVEY.md §2.3): the
tokenizer (with its Porter2 stem cache) lives once per worker in
``__init__``; ``__call__`` processes whole Arrow batches.

Output row per (term, doc, field):
    term:str, doc_int:u64, field:i8, positions:list<i32> (0-based per field,
    IndexBuilder.java:135-139), tf:i32, weight:f64 (tf * field boost),
    doc_tw:i32 (the doc's totalWords, replicated on each of its rows — RLE
    compresses to nothing and lets doc stats be derived without re-tokenize),
    part:i32 (shuffle key = shard * n_salts + salt; shard = stable term hash,
    salt = top bits of doc_int — SURVEY.md §7.3/§4.2 skew handling)

Additionally ONE sentinel row per doc (field == SENTINEL_FIELD, term "",
empty positions) rides the same partitioned shuffle, routed to part
``doc_int % num_parts``: it carries the doc's totalWords exactly once, so
the doc-stats table falls out of the reduce side as a filter — no second
groupby over replicated doc_tw values (A2 without an extra all-to-all).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..config import BuildConfig
from ..functions.tokenizer import Tokenizer
from ..stages.fieldsplit import FIELD_BODY, FIELD_DESCRIPTION, FIELD_TITLE, FIELD_WEIGHTS

POSTING_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_int", pa.int64()),
        ("field", pa.int8()),
        ("positions", pa.list_(pa.int32())),
        ("tf", pa.int32()),
        ("weight", pa.float64()),
        ("doc_tw", pa.int32()),
        ("part", pa.int32()),
    ]
)


SENTINEL_FIELD = -1  # marks the one-per-doc totalWords carrier row


def term_shard(term: str, num_shards: int) -> int:
    """Stable term -> shard routing (query-time uses the same function)."""
    return zlib.crc32(term.encode()) % num_shards


def doc_salt(doc_int: int, salt_bits: int) -> int:
    return (int(doc_int) >> (60 - salt_bits)) if salt_bits else 0


class TokenizeBatch:
    """Callable-class stage for ``map_batches`` (actor pool or tasks)."""

    def __init__(self, config: BuildConfig | None = None):
        self.config = config or BuildConfig()
        self.tokenizer = Tokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        n_salts = 1 << cfg.salt_bits
        tk = self.tokenizer

        terms: list[str] = []
        doc_ints: list[int] = []
        fields: list[int] = []
        positions: list[list[int]] = []
        tfs: list[int] = []
        weights: list[float] = []
        doc_tws: list[int] = []
        parts: list[int] = []

        col_doc_int = batch["doc_int"].to_numpy(zero_copy_only=False)
        col_title = batch["title"].to_pylist()
        col_desc = batch["description"].to_pylist()
        col_body = batch["content"].to_pylist()

        for i in range(batch.num_rows):
            di = int(col_doc_int[i])
            salt = doc_salt(di, cfg.salt_bits)
            # per-(term, field) positions for this doc
            acc: dict[tuple[str, int], list[int]] = {}
            total_words = 0
            for ftype, text in (
                (FIELD_TITLE, col_title[i]),
                (FIELD_DESCRIPTION, col_desc[i]),
                (FIELD_BODY, col_body[i]),
            ):
                if not text:
                    continue
                tokens = tk.tokenize(text)
                total_words += len(tokens)
                for pos, term in enumerate(tokens):
                    acc.setdefault((term, ftype), []).append(pos)

            row_start = len(terms)
            for (term, ftype), poss in acc.items():
                terms.append(term)
                doc_ints.append(di)
                fields.append(ftype)
                positions.append(poss)
                tfs.append(len(poss))
                weights.append(len(poss) * FIELD_WEIGHTS[ftype])
                parts.append(
                    term_shard(term, cfg.num_shards) * n_salts + salt
                )
            doc_tws.extend([total_words] * (len(terms) - row_start))

            # sentinel doc-stats row (see module docstring)
            terms.append("")
            doc_ints.append(di)
            fields.append(SENTINEL_FIELD)
            positions.append([])
            tfs.append(0)
            weights.append(0.0)
            parts.append(di % (cfg.num_shards * n_salts))
            doc_tws.append(total_words)

        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_int": pa.array(doc_ints, pa.int64()),
                "field": pa.array(fields, pa.int8()),
                "positions": pa.array(positions, pa.list_(pa.int32())),
                "tf": pa.array(tfs, pa.int32()),
                "weight": pa.array(weights, pa.float64()),
                "doc_tw": pa.array(doc_tws, pa.int32()),
                "part": pa.array(parts, pa.int32()),
            }
        )

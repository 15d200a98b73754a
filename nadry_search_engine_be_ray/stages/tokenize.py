"""Tokenize stage: documents -> posting tuples (the map side of the index
build shuffle).

Reference analog: IndexBuilder.indexDocumentField (IndexBuilder.java:126-145)
+ InvertedIndex.addTerm merge (InvertedIndex.java:82-122, 183-214), collapsed
into a single stateful ``map_batches`` stage (T1 in SURVEY.md §2.3): the
tokenizer (with its Porter2 stem cache) lives once per worker in
``__init__``; ``__call__`` processes whole Arrow batches.

Output row per (term, doc, field):
    term:str, doc_int:i64, field:i8,
    tf:i32 (occurrences of term in this doc+field),
    pos:binary — the row's positions ALREADY varint-encoded as
        [count][abs][deltas...] (codec.encode_row_positions, one batch-wide
        vectorized pass).  Pre-encoding here roughly halves the bytes the
        posting shuffle moves (vs list<int32> + a redundant weight float +
        replicated doc_tw), and the reduce side assembles final segment
        payloads by byte concatenation instead of re-encoding.
    part:i32 (shuffle key = shard * n_salts + salt; shard = stable term
        hash, salt = top bits of doc_int — SURVEY.md §7.3/§4.2 skew handling)

``weight`` (tf × field boost, InvertedIndex.java:229-232) is NOT shipped:
it is a pure function of (tf, field), recomputed vectorized at encode.

Additionally ONE sentinel row per doc (field == SENTINEL_FIELD, term "",
empty pos, tf = the doc's totalWords) rides the same partitioned shuffle,
routed to part ``doc_int % num_parts``: the doc-stats table (A2) falls out
of the reduce side as a filter — no extra pass, no extra groupby.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..config import BuildConfig
from ..functions import codec
from ..functions.tokenizer import Tokenizer
from ..stages.fieldsplit import FIELD_BODY, FIELD_DESCRIPTION, FIELD_TITLE, FIELD_WEIGHTS

POSTING_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_int", pa.int64()),
        ("field", pa.int8()),
        ("tf", pa.int32()),
        ("pos", pa.binary()),
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
        num_parts = cfg.num_shards * n_salts
        tk = self.tokenizer

        terms: list[str] = []
        doc_ints: list[int] = []
        fields: list[int] = []
        tfs: list[int] = []
        parts: list[int] = []
        lengths: list[int] = []        # positions per row (0 for sentinel)
        flat_pos: list[int] = []       # all positions, row-major

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

            for (term, ftype), poss in acc.items():
                terms.append(term)
                doc_ints.append(di)
                fields.append(ftype)
                tfs.append(len(poss))
                parts.append(term_shard(term, cfg.num_shards) * n_salts + salt)
                lengths.append(len(poss))
                flat_pos.extend(poss)

            # sentinel doc-stats row (see module docstring)
            terms.append("")
            doc_ints.append(di)
            fields.append(SENTINEL_FIELD)
            tfs.append(total_words)
            parts.append(di % num_parts)
            lengths.append(0)

        n = len(terms)
        payload, row_off = codec.encode_row_positions(
            np.asarray(lengths, dtype=np.int64),
            np.asarray(flat_pos, dtype=np.uint64),
        )
        pos_arr = pa.Array.from_buffers(
            pa.binary(),
            n,
            [
                None,
                pa.py_buffer(row_off.astype(np.int32).tobytes()),
                pa.py_buffer(payload),
            ],
        )

        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_int": pa.array(doc_ints, pa.int64()),
                "field": pa.array(fields, pa.int8()),
                "tf": pa.array(tfs, pa.int32()),
                "pos": pos_arr,
                "part": pa.array(parts, pa.int32()),
            }
        )

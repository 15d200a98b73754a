"""Encode stage: posting tuples -> compressed posting-list segment rows.

This is the reduce side of THE wide shuffle (SURVEY.md §2.5 A3): posting
tuples grouped by ``part`` (shard × doc-range salt), then within each group a
vectorized local sort + group-walk builds one encoded posting-list *run* per
term.  A term's complete posting list is the concatenation of its runs in
salt order (runs cover disjoint, ordered doc_int ranges), which is what the
compaction stage (streaming k-way merge analog, north_rule) produces.

Replaces the reference's merge-on-write design (InvertedIndex.java:47-214,
MongoDBIndexStore.java:278-324): no random-access upserts — the build is a
shuffle.

Segment row schema:
    shard:i32, salt:i32, term:str, df:i64,
    docs:binary   (sorted doc_ints, delta-gap + varint),
    tfs:binary    (per-doc total tf, varint),
    weights:binary (per-doc accumulated field weight, f64le),
    block_max:binary (per-128-doc max weight, f64le — block-max WAND),
    positions:binary (per-(doc,field) position lists, see codec),
    pos_offsets:binary (i64le per-doc byte offsets into positions)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import BuildConfig
from ..functions import codec

SEGMENT_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
        ("salt", pa.int32()),
        ("term", pa.string()),
        ("df", pa.int64()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("weights", pa.binary()),
        ("block_max", pa.binary()),
        ("positions", pa.binary()),
        ("pos_offsets", pa.binary()),
    ]
)


def _empty_segment_table() -> pa.Table:
    return SEGMENT_SCHEMA.empty_table()


class EncodePartGroup:
    """``map_groups`` callable for ``groupby("part")``."""

    def __init__(self, config: BuildConfig | None = None):
        self.config = config or BuildConfig()

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.config
        if group.num_rows == 0:
            return _empty_segment_table()
        part = int(group["part"][0].as_py())
        n_salts = 1 << cfg.salt_bits
        shard, salt = part // n_salts, part % n_salts

        g = group.sort_by(
            [("term", "ascending"), ("doc_int", "ascending"), ("field", "ascending")]
        )
        terms = g["term"].to_numpy(zero_copy_only=False)  # object array of str
        doc_ints = g["doc_int"].to_numpy(zero_copy_only=False)
        fields = g["field"].to_numpy(zero_copy_only=False)
        tf = g["tf"].to_numpy(zero_copy_only=False)
        weight = g["weight"].to_numpy(zero_copy_only=False)
        positions = g["positions"].to_pylist()

        n = len(terms)
        # term-run boundaries (terms are sorted -> equal terms contiguous)
        new_term = np.ones(n, dtype=bool)
        new_term[1:] = terms[1:] != terms[:-1]
        term_starts = np.flatnonzero(new_term)
        term_ends = np.empty_like(term_starts)
        term_ends[:-1] = term_starts[1:]
        term_ends[-1] = n

        out = {k: [] for k in (
            "shard", "salt", "term", "df", "docs", "tfs", "weights",
            "block_max", "positions", "pos_offsets",
        )}

        for ts, te in zip(term_starts, term_ends):
            t_docs = doc_ints[ts:te]
            # doc boundaries within the term slice
            nd = np.ones(te - ts, dtype=bool)
            nd[1:] = t_docs[1:] != t_docs[:-1]
            dstarts = np.flatnonzero(nd) + ts
            dends = np.empty_like(dstarts)
            dends[:-1] = dstarts[1:]
            dends[-1] = te

            uniq_docs = doc_ints[dstarts]
            tf_doc = np.add.reduceat(tf[ts:te].astype(np.int64), dstarts - ts)
            w_doc = np.add.reduceat(weight[ts:te], dstarts - ts)
            doc_fields = [
                [
                    (int(fields[r]), np.asarray(positions[r], dtype=np.uint64))
                    for r in range(ds, de)
                ]
                for ds, de in zip(dstarts, dends)
            ]
            pos_buf, pos_off = codec.encode_positions_indexed(doc_fields)

            out["shard"].append(shard)
            out["salt"].append(salt)
            out["term"].append(str(terms[ts]))
            out["df"].append(int(uniq_docs.size))
            out["docs"].append(codec.encode_sorted_deltas(uniq_docs))
            out["tfs"].append(codec.encode_varints(tf_doc.astype(np.uint64)))
            out["weights"].append(codec.encode_f64(w_doc))
            out["block_max"].append(
                codec.encode_f64(codec.block_max(w_doc, cfg.block_size))
            )
            out["positions"].append(pos_buf)
            out["pos_offsets"].append(pos_off.astype("<i8").tobytes())

        return pa.table(
            {
                "shard": pa.array(out["shard"], pa.int32()),
                "salt": pa.array(out["salt"], pa.int32()),
                "term": pa.array(out["term"], pa.string()),
                "df": pa.array(out["df"], pa.int64()),
                "docs": pa.array(out["docs"], pa.binary()),
                "tfs": pa.array(out["tfs"], pa.binary()),
                "weights": pa.array(out["weights"], pa.binary()),
                "block_max": pa.array(out["block_max"], pa.binary()),
                "positions": pa.array(out["positions"], pa.binary()),
                "pos_offsets": pa.array(out["pos_offsets"], pa.binary()),
            }
        )


def encode_part_group(group: pa.Table, cfg: BuildConfig | None = None) -> pa.Table:
    """Function wrapper for ``map_groups`` (which requires a named fn)."""
    return EncodePartGroup(cfg)(group)


def _merge_runs(
    docs_bufs: list[bytes],
    tfs_bufs: list[bytes],
    w_bufs: list[bytes],
    pos_bufs: list[bytes],
    off_bufs: list[bytes],
    block_size: int,
) -> tuple[bytes, bytes, bytes, bytes, bytes, bytes, int]:
    """Streaming merge of salt-ordered runs (disjoint ascending doc ranges):
    tfs / weights / positions payloads concatenate byte-wise (varint and f64
    are per-value codes; position sub-streams are per-doc); only the doc-gap
    stream is re-encoded across run boundaries; block_max recomputes over the
    merged weights."""
    docs = np.concatenate([codec.decode_sorted_deltas(b) for b in docs_bufs])
    weights = np.concatenate([codec.decode_f64(b) for b in w_bufs])
    offs = []
    shift = 0
    for i, ob in enumerate(off_bufs):
        o = np.frombuffer(ob, dtype="<i8")
        offs.append((o[1:] if i else o) + shift)
        shift += int(o[-1])
    return (
        codec.encode_sorted_deltas(docs),
        b"".join(tfs_bufs),
        codec.encode_f64(weights),
        codec.encode_f64(codec.block_max(weights, block_size)),
        b"".join(pos_bufs),
        np.concatenate(offs).astype("<i8").tobytes(),
        int(docs.size),
    )


def merge_shard_runs(group: pa.Table, block_size: int = codec.BLOCK_SIZE) -> pa.Table:
    """Compaction ``map_groups`` callable for ``groupby("shard")``: merge each
    term's salted runs into one row, for every term of the shard in one
    vectorized task (grouping per shard, not per term, keeps the task count
    at num_shards instead of num_terms — the per-term merge itself is cheap
    byte concatenation, see :func:`_merge_runs`)."""
    g = group.sort_by([("term", "ascending"), ("salt", "ascending")])
    terms = g["term"].to_numpy(zero_copy_only=False)
    n = len(terms)
    if n == 0:
        return _empty_segment_table()
    new_term = np.ones(n, dtype=bool)
    new_term[1:] = terms[1:] != terms[:-1]
    starts = np.flatnonzero(new_term)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = n

    shard = int(g["shard"][0].as_py())
    docs_c = g["docs"].to_pylist()
    tfs_c = g["tfs"].to_pylist()
    w_c = g["weights"].to_pylist()
    bm_c = g["block_max"].to_pylist()
    pos_c = g["positions"].to_pylist()
    off_c = g["pos_offsets"].to_pylist()
    df_c = g["df"].to_pylist()

    out = {k: [] for k in ("term", "df", "docs", "tfs", "weights",
                           "block_max", "positions", "pos_offsets")}
    for s, e in zip(starts, ends):
        out["term"].append(str(terms[s]))
        if e - s == 1:
            out["df"].append(int(df_c[s]))
            out["docs"].append(docs_c[s])
            out["tfs"].append(tfs_c[s])
            out["weights"].append(w_c[s])
            out["block_max"].append(bm_c[s])
            out["positions"].append(pos_c[s])
            out["pos_offsets"].append(off_c[s])
        else:
            d, t, w, bm, p, o, df = _merge_runs(
                docs_c[s:e], tfs_c[s:e], w_c[s:e], pos_c[s:e], off_c[s:e],
                block_size,
            )
            out["df"].append(df)
            out["docs"].append(d)
            out["tfs"].append(t)
            out["weights"].append(w)
            out["block_max"].append(bm)
            out["positions"].append(p)
            out["pos_offsets"].append(o)

    nrows = len(out["term"])
    return pa.table(
        {
            "shard": pa.array([shard] * nrows, pa.int32()),
            "salt": pa.array([-1] * nrows, pa.int32()),  # merged marker
            "term": pa.array(out["term"], pa.string()),
            "df": pa.array(out["df"], pa.int64()),
            "docs": pa.array(out["docs"], pa.binary()),
            "tfs": pa.array(out["tfs"], pa.binary()),
            "weights": pa.array(out["weights"], pa.binary()),
            "block_max": pa.array(out["block_max"], pa.binary()),
            "positions": pa.array(out["positions"], pa.binary()),
            "pos_offsets": pa.array(out["pos_offsets"], pa.binary()),
        }
    )

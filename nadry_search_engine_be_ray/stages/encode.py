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
    pos_offsets:binary (per-doc byte offsets into positions, delta+varint)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import BuildConfig
from ..functions import codec
from ..stages.fieldsplit import FIELD_WEIGHTS

# field id -> boost, as a numpy lookup (TITLE 3.0 / DESCRIPTION 1.5 / BODY 1.0,
# indexer/InvertedIndex.java:18-32)
_FIELD_BOOSTS = np.array(
    [FIELD_WEIGHTS[f] for f in sorted(FIELD_WEIGHTS)], dtype=np.float64
)

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
        """Fully vectorized encode: no per-row Python.  The tokenize stage
        already shipped each row's positions as final ``[count][abs][deltas]``
        varint bytes (codec.encode_row_positions), so the per-doc payload is
        a 1-byte field mask (mask <= 7, so its varint IS the byte) followed
        by the doc's row payloads in field order — assembled here with one
        numpy byte gather, no re-encoding.  Weight = tf × field boost is
        recomputed (it never rides the shuffle)."""
        cfg = self.config
        if group.num_rows == 0:
            return _empty_segment_table()
        part = int(group["part"][0].as_py())
        n_salts = 1 << cfg.salt_bits
        shard, salt = part // n_salts, part % n_salts

        g = group.combine_chunks().sort_by(
            [("term", "ascending"), ("doc_int", "ascending"), ("field", "ascending")]
        ).combine_chunks()
        term_codes_arr = g["term"].combine_chunks().dictionary_encode()
        term_codes = term_codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        term_dict = term_codes_arr.dictionary.to_pylist()
        doc = g["doc_int"].to_numpy(zero_copy_only=False).astype(np.int64)
        field = g["field"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = g["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        weight = tf * _FIELD_BOOSTS[field]
        pos_arr = g["pos"].combine_chunks()
        ao = pos_arr.offset
        n = doc.size
        offs = np.frombuffer(pos_arr.buffers()[1], dtype=np.int32)[
            ao : ao + n + 1
        ].astype(np.int64)
        data = np.frombuffer(pos_arr.buffers()[2], dtype=np.uint8)
        row_lens = offs[1:] - offs[:-1]

        # ---- doc / term boundaries at row granularity ----
        nd = np.ones(n, dtype=bool)
        nd[1:] = (term_codes[1:] != term_codes[:-1]) | (doc[1:] != doc[:-1])
        doc_start_rows = np.flatnonzero(nd)
        n_docs = doc_start_rows.size
        didx = np.cumsum(nd) - 1                      # doc index per row

        uniq_doc = doc[doc_start_rows]
        term_of_doc = term_codes[doc_start_rows]
        tf_doc = np.add.reduceat(tf, doc_start_rows)
        w_doc = np.add.reduceat(weight, doc_start_rows)
        mask_doc = np.bitwise_or.reduceat(
            np.left_shift(np.int64(1), field), doc_start_rows
        )

        ntd = np.ones(n_docs, dtype=bool)
        ntd[1:] = term_of_doc[1:] != term_of_doc[:-1]
        term_doc_starts = np.flatnonzero(ntd)         # doc-index of term starts
        term_doc_ends = np.empty_like(term_doc_starts)
        term_doc_ends[:-1] = term_doc_starts[1:]
        term_doc_ends[-1] = n_docs

        # ---- per-doc payload = [1-byte mask][row payload bytes...] -------
        row_byte_cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(row_lens, out=row_byte_cum[1:])
        doc_end_rows = np.empty_like(doc_start_rows)
        doc_end_rows[:-1] = doc_start_rows[1:]
        doc_end_rows[-1] = n
        rows_per_doc = doc_end_rows - doc_start_rows
        doc_payload_len = 1 + (
            row_byte_cum[doc_end_rows] - row_byte_cum[doc_start_rows]
        )
        doc_byte_off = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(doc_payload_len, out=doc_byte_off[1:])
        total_bytes = int(doc_byte_off[-1])
        out_buf = np.empty(total_bytes, dtype=np.uint8)
        out_buf[doc_byte_off[:-1]] = mask_doc.astype(np.uint8)
        row_out_start = (
            np.repeat(doc_byte_off[:-1] + 1, rows_per_doc)
            + row_byte_cum[:-1]
            - np.repeat(row_byte_cum[doc_start_rows], rows_per_doc)
        )
        total_row_bytes = int(row_byte_cum[-1])
        if total_row_bytes:
            dst_idx = np.repeat(row_out_start, row_lens) + (
                np.arange(total_row_bytes) - np.repeat(row_byte_cum[:-1], row_lens)
            )
            out_buf[dst_idx] = data[offs[0] : offs[0] + total_row_bytes]
        payload_all = out_buf.tobytes()
        doc_byte_off = doc_byte_off[:-1]               # start byte per doc

        # ---- doc-gap and tf varint streams at doc granularity ----
        dd = uniq_doc.astype(np.uint64).copy()
        if n_docs > 1:
            dd[1:] = (uniq_doc[1:] - uniq_doc[:-1]).astype(np.uint64)
        dd[term_doc_starts] = uniq_doc[term_doc_starts].astype(np.uint64)
        nb_d = codec._varint_nbytes(dd)
        cum_d = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(nb_d, out=cum_d[1:])
        enc_docs = codec.encode_varints(dd)

        tfu = tf_doc.astype(np.uint64)
        nb_t = codec._varint_nbytes(tfu)
        cum_t = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(nb_t, out=cum_t[1:])
        enc_tfs = codec.encode_varints(tfu)

        # ---- assemble one output row per term (cheap slicing loop) ----
        out = {k: [] for k in (
            "shard", "salt", "term", "df", "docs", "tfs", "weights",
            "block_max", "positions", "pos_offsets",
        )}
        for ts, te in zip(term_doc_starts, term_doc_ends):
            out["shard"].append(shard)
            out["salt"].append(salt)
            out["term"].append(term_dict[int(term_of_doc[ts])])
            out["df"].append(int(te - ts))
            out["docs"].append(enc_docs[cum_d[ts] : cum_d[te]])
            out["tfs"].append(enc_tfs[cum_t[ts] : cum_t[te]])
            out["weights"].append(codec.encode_f64(w_doc[ts:te]))
            out["block_max"].append(
                codec.encode_f64(codec.block_max(w_doc[ts:te], cfg.block_size))
            )
            start_b = int(doc_byte_off[ts])
            end_b = int(doc_byte_off[te]) if te < n_docs else total_bytes
            out["positions"].append(payload_all[start_b:end_b])
            offs = np.empty(te - ts + 1, dtype=np.int64)
            offs[:-1] = doc_byte_off[ts:te] - start_b
            offs[-1] = end_b - start_b
            # offsets are monotone with tiny gaps -> delta+varint shrinks
            # them ~6x (raw i64 offsets dominated segment size at scale)
            out["pos_offsets"].append(
                codec.encode_sorted_deltas(offs.astype(np.uint64))
            )

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


def encode_part_dirs(
    batch: pa.Table,
    cfg: BuildConfig | None = None,
    doc_stats_parts_dir: str | None = None,
) -> pa.Table:
    """Map-side encode over a storage-partitioned shuffle: ``batch`` holds
    rows (part:int, path:str); each part's posting tuples were already
    hash-partitioned into ``path`` by the tokenize phase's partitioned
    parquet write, so the wide exchange needs NO in-memory shuffle here —
    this task just reads its part directory and encodes (the MapReduce
    shuffle-via-storage pattern; also what makes the reduce side resumable
    per part).

    When ``doc_stats_parts_dir`` is set, the per-doc SENTINEL rows the
    tokenize stage routed into this part (field == SENTINEL_FIELD, exactly
    one per doc corpus-wide) are split off and written there as the final
    (doc_int, total_words) doc-stats partial (idempotent tmp+rename), so
    doc stats need no groupby of their own.
    """
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq_mod

    from .tokenize import SENTINEL_FIELD

    cfg = cfg or BuildConfig()
    enc = EncodePartGroup(cfg)
    outs = []
    for part, path in zip(batch["part"].to_pylist(), batch["path"].to_pylist()):
        t = pq_mod.read_table(path, use_threads=False)  # 1-CPU task: avoid pool oversubscription
        is_sent = pc.equal(t["field"], pa.scalar(SENTINEL_FIELD, pa.int8()))
        if doc_stats_parts_dir is not None:
            sent = t.filter(is_sent)
            partial_tbl = pa.table(
                {
                    "doc_int": sent["doc_int"],
                    "total_words": sent["tf"],  # sentinel rows carry totalWords in tf
                }
            )
            final = os.path.join(doc_stats_parts_dir, f"part-{part:05d}.parquet")
            tmp = final + ".tmp"
            pq_mod.write_table(partial_tbl, tmp)
            os.replace(tmp, final)
        t = t.filter(pc.invert(is_sent))
        t = t.append_column(
            "part", pa.array(np.full(t.num_rows, part, dtype=np.int32), pa.int32())
        )
        if t.num_rows:
            outs.append(enc(t))
    if not outs:
        return _empty_segment_table()
    return pa.concat_tables(outs)


def merge_term_rows_interleaved(
    docs_bufs: list[bytes],
    tfs_bufs: list[bytes],
    w_bufs: list[bytes],
    pos_bufs: list[bytes],
    off_bufs: list[bytes],
    block_size: int,
) -> tuple[bytes, bytes, bytes, bytes, bytes, bytes, int]:
    """GENERAL k-way merge of posting runs whose doc ranges INTERLEAVE
    (cross-index segment merge, Lucene-style): decode every run, merge-sort
    by doc_int, reorder the per-doc positions payload slices with one byte
    gather, re-encode.  Raises on a doc appearing in more than one run —
    merging indexes that share documents requires a dedup pass first.

    The within-build salt-run merge (:func:`_merge_runs`) stays the cheap
    path: its runs cover disjoint ascending ranges so payloads concatenate
    without decoding."""
    docs_parts = [codec.decode_sorted_deltas(b).astype(np.int64) for b in docs_bufs]
    docs_all = np.concatenate(docs_parts)
    order = np.argsort(docs_all, kind="stable")
    docs_m = docs_all[order]
    if docs_m.size > 1 and not np.all(docs_m[1:] > docs_m[:-1]):
        raise ValueError(
            "duplicate doc_int across merged runs — dedup before index merge"
        )
    tfs_m = np.concatenate(
        [codec.decode_varints(b).astype(np.uint64) for b in tfs_bufs]
    )[order]
    w_m = np.concatenate([codec.decode_f64(b) for b in w_bufs])[order]

    # per-doc byte slices into the concatenation of all runs' payloads
    pos_all = np.frombuffer(b"".join(pos_bufs), dtype=np.uint8)
    starts_parts, lens_parts = [], []
    base = 0
    for pb, ob in zip(pos_bufs, off_bufs):
        off = codec.decode_sorted_deltas(ob).astype(np.int64)
        starts_parts.append(off[:-1] + base)
        lens_parts.append(off[1:] - off[:-1])
        base += len(pb)
    starts = np.concatenate(starts_parts)[order]
    lens = np.concatenate(lens_parts)[order]
    total = int(lens.sum())
    out_off = np.zeros(docs_m.size + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    idx = np.repeat(starts, lens) + (
        np.arange(total) - np.repeat(out_off[:-1], lens)
    )
    merged_pos = pos_all[idx].tobytes()

    return (
        codec.encode_sorted_deltas(docs_m.astype(np.uint64)),
        codec.encode_varints(tfs_m),
        codec.encode_f64(w_m),
        codec.encode_f64(codec.block_max(w_m, block_size)),
        merged_pos,
        codec.encode_sorted_deltas(out_off.astype(np.uint64)),
        int(docs_m.size),
    )


def encode_docs_stream(docs: np.ndarray, docs_codec: str) -> bytes:
    """Encode a sorted doc_int stream with the configured FINAL-tier codec
    (BuildConfig.docs_codec; pre-compaction salt runs are always varint).
    The "ef" tier (Elias-Fano, codec.encode_ef) applies to the MONOTONE
    streams only — docs and pos_offsets; its tfs stream falls back to the
    FOR block code since tf values are unsorted."""
    if docs_codec == "bitpack":
        return codec.encode_sorted_bitpack(docs.astype(np.uint64))
    if docs_codec == "ef":
        return codec.encode_ef(docs.astype(np.uint64))
    return codec.encode_sorted_deltas(docs)


def decode_docs_stream(buf: bytes, docs_codec: str) -> np.ndarray:
    if docs_codec == "bitpack":
        return codec.decode_sorted_bitpack(buf)
    if docs_codec == "ef":
        return codec.decode_ef(buf)
    return codec.decode_sorted_deltas(buf)


def encode_tfs_stream(tfs: np.ndarray, docs_codec: str) -> bytes:
    """tf values are 1-3 bits wide, so the block code cuts this stream
    ~55% vs varint's 1-byte floor (BASELINE.md posting-codec table); no
    delta — tfs are unsorted (so the ef tier also block-packs here)."""
    if docs_codec in ("bitpack", "ef"):
        return codec.encode_bitpack(tfs.astype(np.uint64))
    return codec.encode_varints(tfs)


def decode_tfs_stream(buf: bytes, docs_codec: str) -> np.ndarray:
    if docs_codec in ("bitpack", "ef"):
        return codec.decode_bitpack(buf)
    return codec.decode_varints(buf)


def _merge_runs(
    docs_bufs: list[bytes],
    tfs_bufs: list[bytes],
    w_bufs: list[bytes],
    pos_bufs: list[bytes],
    off_bufs: list[bytes],
    block_size: int,
    docs_codec: str = "varint",
) -> tuple[bytes, bytes, bytes, bytes, bytes, bytes, int]:
    """Streaming merge of salt-ordered runs (disjoint ascending doc ranges):
    tfs / weights / positions payloads concatenate byte-wise (varint and f64
    are per-value codes; position sub-streams are per-doc); only the doc-gap
    stream is re-encoded across run boundaries (with the FINAL-tier codec —
    inputs are always varint salt runs); block_max recomputes over the
    merged weights."""
    docs = np.concatenate([codec.decode_sorted_deltas(b) for b in docs_bufs])
    weights = np.concatenate([codec.decode_f64(b) for b in w_bufs])
    offs = []
    shift = 0
    for i, ob in enumerate(off_bufs):
        o = codec.decode_sorted_deltas(ob).astype(np.int64)
        offs.append((o[1:] if i else o) + shift)
        shift += int(o[-1])
    tfs_cat = b"".join(tfs_bufs)
    if docs_codec != "varint":
        tfs_cat = encode_tfs_stream(codec.decode_varints(tfs_cat), docs_codec)
    return (
        encode_docs_stream(docs, docs_codec),
        tfs_cat,
        codec.encode_f64(weights),
        codec.encode_f64(codec.block_max(weights, block_size)),
        b"".join(pos_bufs),
        encode_docs_stream(
            np.concatenate(offs).astype(np.uint64), docs_codec),
        int(docs.size),
    )


def merge_shard_runs(group: pa.Table, block_size: int = codec.BLOCK_SIZE,
                     docs_codec: str = "varint") -> pa.Table:
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
            out["docs"].append(
                docs_c[s] if docs_codec == "varint"
                # single varint run -> re-encode with the final-tier codec
                else encode_docs_stream(
                    codec.decode_sorted_deltas(docs_c[s]), docs_codec)
            )
            out["tfs"].append(
                tfs_c[s] if docs_codec == "varint"
                else encode_tfs_stream(
                    codec.decode_varints(tfs_c[s]), docs_codec)
            )
            out["weights"].append(w_c[s])
            out["block_max"].append(bm_c[s])
            out["positions"].append(pos_c[s])
            out["pos_offsets"].append(
                off_c[s] if docs_codec == "varint"
                else encode_docs_stream(
                    codec.decode_sorted_deltas(off_c[s]).astype(np.uint64),
                    docs_codec)
            )
        else:
            d, t, w, bm, p, o, df = _merge_runs(
                docs_c[s:e], tfs_c[s:e], w_c[s:e], pos_c[s:e], off_c[s:e],
                block_size, docs_codec,
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


def merge_shard_dirs(batch: pa.Table, block_size: int = codec.BLOCK_SIZE,
                     docs_codec: str = "varint") -> pa.Table:
    """Reduce side of the STORAGE segment exchange
    (``BuildConfig.segment_exchange == "storage"``): ``batch`` holds rows
    (shard:int, path:str) where ``path`` is one ``shard=K`` hive directory of
    encoded salt-run rows staged by the encode tasks' partitioned write.
    Reads the directory (page-cache-backed — the staging files were written
    moments ago) and k-way merges it exactly like :func:`merge_shard_runs`,
    so the two exchange variants are byte-identical downstream."""
    import pyarrow.dataset as pads

    outs = []
    for shard, path in zip(batch["shard"].to_pylist(), batch["path"].to_pylist()):
        t = pads.dataset(path, format="parquet").to_table(use_threads=False)
        # the hive write strips the partition column; restore it for
        # merge_shard_runs (which reads group["shard"][0])
        t = t.append_column(
            "shard", pa.array(np.full(t.num_rows, shard, dtype=np.int32), pa.int32())
        )
        outs.append(
            merge_shard_runs(t, block_size=block_size, docs_codec=docs_codec)
        )
    if not outs:
        return _empty_segment_table()
    return pa.concat_tables(outs)

"""Document deletion: tombstone write + the purge merge that makes it real.

Reference analog: the reference engine deletes by re-crawling — its store
is dropped and rebuilt from scratch per index run (indexer/Main.java:58-61
drops the collections).  A 100 TB index cannot afford that, so this module
implements the Lucene delete lifecycle over immutable parquet segments:

* :func:`delete_docs` — O(tombstones): unions doc_ints into the side file
  (state/deletes.py); every SegmentReader masks posting lists against it
  at decode time and scoring stats stay STALE (docFreq-includes-deletes)
  until purge.
* :func:`purge_deletes` — the physical rewrite, one Ray task per term
  shard (the same parts-table shape as build/merge): each segment row is
  kept byte-identical when none of its docs are deleted (the common case
  — only the cheap docs-stream decode + one searchsorted probe is paid),
  else masked and re-encoded with the index's own codec tier.  Side
  tables (doc_stats / prepped / postings / popularity) stream through a
  vectorized live-mask filter; stats.json is recomputed; derived kgram
  dirs are invalidated (they rebuild lazily behind their _DONE marker);
  the tombstone file is cleared last.

After a purge the index is EQUIVALENT to a fresh build over the surviving
corpus — doc_ints are content-derived (stages/prep.py M2), so posting
payload bytes for untouched terms are literally identical, and the masked
rows re-encode to exactly what the fresh build would emit
(tests/test_deletes.py asserts per-term byte equality).

Scale shape: purge parallelism = num_shards, no all-to-all — the term ->
shard routing is untouched, so every rewrite is shard-local.  The side-
table filters are embarrassingly parallel streaming scans.  The only
broadcast is the tombstone set itself (8 B/doc; see state/deletes.py for
the purge-before-it-outgrows-the-heap contract, tracked by the
``tombstone_fraction`` this function returns).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import codec
from ..stages.encode import (
    SEGMENT_SCHEMA,
    _empty_segment_table,
    decode_docs_stream,
    decode_tfs_stream,
    encode_docs_stream,
    encode_tfs_stream,
)
from ..state import deletes as deletes_state
from ..state.deletes import live_mask
from .build import _done, _mark_done

_SIDE_TABLES = ("doc_stats", "prepped", "postings", "popularity")


def delete_docs(index_dir: str, doc_ints) -> dict:
    """Logically delete documents: O(tombstones), visible to every reader
    constructed afterwards (running actors hold the set they loaded —
    the same snapshot semantics Lucene gives an open IndexReader)."""
    return deletes_state.write_tombstones(index_dir, doc_ints)


def _purge_row(row: dict, deleted: np.ndarray, docs_codec: str,
               block_size: int) -> dict | None:
    """One segment term row -> (possibly rewritten) row, or None when all
    its docs are dead.  Untouched rows pass their encoded buffers through
    byte-identical."""
    docs = decode_docs_stream(row["docs"], docs_codec).astype(np.int64)
    keep = live_mask(docs, deleted)
    n_keep = int(keep.sum())
    if n_keep == docs.size:
        return row
    if n_keep == 0:
        return None
    tfs = decode_tfs_stream(row["tfs"], docs_codec).astype(np.int64)
    weights = codec.decode_f64(row["weights"])
    offs = decode_docs_stream(row["pos_offsets"], docs_codec).astype(np.int64)
    masked = deletes_state.mask_posting(
        docs, tfs, weights, row["positions"], offs, deleted, block_size
    )
    assert masked is not None
    m_docs, m_tfs, m_w, m_bmax, m_buf, m_off, _df_total = masked
    return {
        "shard": row["shard"],
        "salt": row["salt"],
        "term": row["term"],
        "df": n_keep,
        "docs": encode_docs_stream(m_docs, docs_codec),
        "tfs": encode_tfs_stream(m_tfs.astype(np.uint64), docs_codec),
        "weights": codec.encode_f64(m_w),
        "block_max": codec.encode_f64(m_bmax),
        "positions": m_buf,
        "pos_offsets": encode_docs_stream(
            m_off.astype(np.uint64), docs_codec
        ),
    }


def _purge_segment_files(files: list[str], deleted: np.ndarray,
                         shard: int, docs_codec: str,
                         block_size: int) -> pa.Table:
    out_rows: list[dict] = []
    for fp in sorted(files):
        t = pq.read_table(fp, use_threads=False)
        cols = {name: t[name].to_pylist() for name in t.schema.names}
        for i in range(t.num_rows):
            row = {name: cols[name][i] for name in cols}
            row["shard"] = shard
            new = _purge_row(row, deleted, docs_codec, block_size)
            if new is not None:
                out_rows.append(new)
    if not out_rows:
        return _empty_segment_table()
    return pa.table(
        {f.name: pa.array([r[f.name] for r in out_rows], f.type)
         for f in SEGMENT_SCHEMA},
        schema=SEGMENT_SCHEMA,
    )


def purge_deletes(index_dir: str, *, concurrency: int | None = None,
                  segment_row_group_size: int = 512) -> dict:
    """Physically remove tombstoned docs (module docstring).  Returns
    ``{"n_purged", "n_docs_before", "n_docs_after", "tombstone_fraction",
    "n_term_rows_before", "n_term_rows_after"}``; no-op when the
    tombstone set is empty."""
    import ray
    import ray.data

    deleted = deletes_state.load_tombstones(index_dir)
    stats_path = os.path.join(index_dir, "stats.json")
    with open(stats_path) as f:
        stats = json.load(f)
    if deleted.size == 0:
        return {
            "n_purged": 0,
            "n_docs_before": stats["n_docs"],
            "n_docs_after": stats["n_docs"],
            "tombstone_fraction": 0.0,
            "n_term_rows_before": stats.get("n_term_rows", 0),
            "n_term_rows_after": stats.get("n_term_rows", 0),
        }

    seg_name = "segments_merged" if stats["compacted"] else "segments"
    seg_root = os.path.join(index_dir, seg_name)
    num_shards = int(stats["num_shards"])
    docs_codec = stats.get("docs_codec", "varint")
    block_size = int(stats.get("block_size", codec.BLOCK_SIZE))
    deleted_ref = ray.put(deleted)

    # ---- segments: one task per shard, byte-identical fast path ---------
    tmp_seg = seg_root + ".purge"
    shutil.rmtree(tmp_seg, ignore_errors=True)

    def purge_shard(batch: pa.Table) -> pa.Table:
        dead = ray.get(deleted_ref)
        outs = []
        for shard in batch["shard"].to_pylist():
            files = glob.glob(
                os.path.join(seg_root, f"shard={shard}", "*.parquet")
            )
            outs.append(
                _purge_segment_files(files, dead, shard, docs_codec,
                                     block_size)
            )
        return pa.concat_tables(outs) if outs else _empty_segment_table()

    (
        ray.data.from_arrow(
            pa.table({"shard": pa.array(range(num_shards), pa.int32())})
        )
        .repartition(num_shards)
        .map_batches(purge_shard, batch_format="pyarrow", batch_size=1,
                     **({"concurrency": concurrency} if concurrency else {}))
        .write_parquet(tmp_seg, partition_cols=["shard"],
                       row_group_size=segment_row_group_size)
    )

    # ---- side tables: streaming live-mask filter -------------------------
    def drop_dead(batch: pa.Table) -> pa.Table:
        dead = ray.get(deleted_ref)
        di = batch["doc_int"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(live_mask(di, dead)))

    rewritten: list[tuple[str, str, bool]] = []  # (live, tmp, had_marker)
    for sub in _SIDE_TABLES:
        live = os.path.join(index_dir, sub)
        if not os.path.isdir(live):
            continue
        tmp = live + ".purge"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            ray.data.read_parquet(live, file_extensions=["parquet"])
            .map_batches(drop_dead, batch_format="pyarrow")
            .write_parquet(tmp)
        )
        rewritten.append((live, tmp, _done(live)))

    # ---- swap everything, then stats / invalidation / clear --------------
    # (not crash-atomic across dirs; a re-run of purge_deletes after a
    # crash is safe — surviving tombstones re-mask already-purged segments
    # to the same result, and .purge tmp dirs are cleared up front)
    shutil.rmtree(seg_root)
    os.replace(tmp_seg, seg_root)
    for live, tmp, had_marker in rewritten:
        shutil.rmtree(live)
        os.replace(tmp, live)
        if had_marker:
            _mark_done(live)

    def _count_rows(root: str) -> int:
        total = 0
        for fp in glob.glob(os.path.join(root, "**", "*.parquet"),
                            recursive=True):
            total += pq.read_metadata(fp).num_rows
        return total

    import pyarrow.dataset as pads

    doc_stats_dir = os.path.join(index_dir, "doc_stats")
    n_docs = _count_rows(doc_stats_dir)
    tw = pads.dataset(doc_stats_dir, format="parquet").to_table(
        columns=["total_words"]
    )["total_words"]
    total_words = int(np.sum(tw.to_numpy(zero_copy_only=False),
                             dtype=np.int64))
    n_before = int(stats["n_docs"])
    n_term_rows_before = int(stats.get("n_term_rows", 0))
    stats.update(
        n_docs=n_docs,
        total_words=total_words,
        avgdl=(total_words / n_docs) if n_docs else 0.0,
        n_term_rows=_count_rows(seg_root),
    )
    with open(stats_path, "w") as f:
        json.dump(stats, f, indent=2)

    for kd in glob.glob(os.path.join(index_dir, "kgram_*")):
        shutil.rmtree(kd, ignore_errors=True)  # rebuilds lazily on demand

    deletes_state.clear_tombstones(index_dir)
    return {
        "n_purged": n_before - n_docs,
        "n_docs_before": n_before,
        "n_docs_after": n_docs,
        "tombstone_fraction": (n_before - n_docs) / n_before
        if n_before else 0.0,
        "n_term_rows_before": n_term_rows_before,
        "n_term_rows_after": stats["n_term_rows"],
    }

"""Incremental index merge: combine independently built indexes into one.

The reference cannot do this at all — its index build DROPS the collections
and starts over (indexer/Main.java:58-61).  Here a delta corpus can be built
into its own index (cheap, only the new docs) and merged with the base in
one pass: per shard, a GENERAL k-way posting merge
(stages/encode.merge_term_rows_interleaved — doc ranges interleave across
indexes, so runs are decoded, merge-sorted by doc_int and re-encoded with a
single byte-gather for the positions payload), doc-stats / documents tables
are concatenated by file copy, and global stats recompute from footers.

Preconditions (asserted): identical (num_shards, salt_bits), compacted
segments, and DISJOINT document sets (run exact dedup across corpora first —
the merge raises on a duplicate doc_int).

Tombstones are CONSUMED by the merge (Lucene's segment-merge semantics:
merging applies deletes physically): each source's
``deletes/tombstones.parquet`` set is unioned and dead docs are dropped
from posting rows during the k-way merge (the same mask/re-encode path as
``pipelines.deletes.purge_deletes``, byte-identical fast path when a term
touches no dead doc), doc_stats / prepped copies are live-filtered, stats
recompute over survivors, and the merged index carries NO tombstone file.

Shape: one Ray task per shard (the parts-table pattern used everywhere in
build.py) — parallelism = num_shards, no all-to-all: shard routing is a pure
function of the term, so the same shard of every index holds the same terms.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..stages.encode import (
    SEGMENT_SCHEMA,
    _empty_segment_table,
    merge_term_rows_interleaved,
)
from ..state import deletes as deletes_state
from ..state.deletes import live_mask


def _copy_parquet_dir(src: str, dst: str, tag: str,
                      dead: np.ndarray | None = None) -> None:
    """Copy (or, with a non-empty ``dead`` set, live-filter-copy) every
    parquet file of ``src`` into ``dst``.  Filtering streams one file at a
    time — no table ever exceeds one source file."""
    os.makedirs(dst, exist_ok=True)
    for fp in glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True):
        out = os.path.join(dst, f"{tag}-{os.path.basename(fp)}")
        if dead is None or dead.size == 0:
            shutil.copy2(fp, out)
        else:
            t = pq.read_table(fp)
            di = t["doc_int"].to_numpy(zero_copy_only=False).astype(np.int64)
            pq.write_table(t.filter(pa.array(live_mask(di, dead))), out)


def _apply_tombstones_table(t: pa.Table, dead: np.ndarray,
                            block_size: int) -> pa.Table:
    """Purge dead docs from the payload-only segment table ``t`` (the
    per-source read inside merge_shard) — same row transform as
    purge_deletes, varint codec (merge precondition); rows whose docs all
    died are dropped."""
    from .deletes import _purge_row

    if t.num_rows == 0:
        return t
    cols = {name: t[name].to_pylist() for name in t.schema.names}
    out_rows = []
    for i in range(t.num_rows):
        row = {name: cols[name][i] for name in cols}
        row.setdefault("shard", 0)
        row.setdefault("salt", -1)
        new = _purge_row(row, dead, "varint", block_size)
        if new is not None:
            out_rows.append(new)
    if not out_rows:
        return t.slice(0, 0)
    return pa.table(
        {n: pa.array([r[n] for r in out_rows], t.schema.field(n).type)
         for n in t.schema.names}
    )


def _merge_shard_tables(tables: list[pa.Table], shard: int,
                        block_size: int) -> pa.Table:
    t = pa.concat_tables(tables, promote_options="default")
    if t.num_rows == 0:
        return _empty_segment_table()
    g = t.sort_by([("term", "ascending")])
    terms = g["term"].to_numpy(zero_copy_only=False)
    n = len(terms)
    new_term = np.ones(n, dtype=bool)
    new_term[1:] = terms[1:] != terms[:-1]
    starts = np.flatnonzero(new_term)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = n

    cols = {
        k: g[k].to_pylist()
        for k in ("df", "docs", "tfs", "weights", "block_max",
                  "positions", "pos_offsets")
    }
    out = {k: [] for k in ("term", "df", "docs", "tfs", "weights",
                           "block_max", "positions", "pos_offsets")}
    for s, e in zip(starts, ends):
        out["term"].append(str(terms[s]))
        if e - s == 1:
            for k in ("df", "docs", "tfs", "weights", "block_max",
                      "positions", "pos_offsets"):
                out[k].append(cols[k][s])
        else:
            d, tf, w, bm, p, o, df = merge_term_rows_interleaved(
                cols["docs"][s:e], cols["tfs"][s:e], cols["weights"][s:e],
                cols["positions"][s:e], cols["pos_offsets"][s:e], block_size,
            )
            out["df"].append(df)
            out["docs"].append(d)
            out["tfs"].append(tf)
            out["weights"].append(w)
            out["block_max"].append(bm)
            out["positions"].append(p)
            out["pos_offsets"].append(o)

    nrows = len(out["term"])
    return pa.table(
        {
            "shard": pa.array([shard] * nrows, pa.int32()),
            "salt": pa.array([-1] * nrows, pa.int32()),
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


def merge_indexes(index_dirs: list[str], out_dir: str,
                  block_size: int = 128,
                  segment_row_group_size: int = 512) -> dict:
    """Merge ≥2 compacted indexes with identical layout config into
    ``out_dir``; returns the merged stats dict.  ``segment_row_group_size``
    mirrors BuildConfig's knob so merged segments keep the page-lazy
    reader's fetch unit."""
    assert len(index_dirs) >= 2
    stats = []
    for d in index_dirs:
        with open(os.path.join(d, "stats.json")) as f:
            stats.append(json.load(f))
    num_shards = stats[0]["num_shards"]
    for s in stats[1:]:
        assert s["num_shards"] == num_shards, "num_shards mismatch"
        assert s["salt_bits"] == stats[0]["salt_bits"], "salt_bits mismatch"
        assert s["compacted"], "merge requires compacted indexes"
    for s in stats:
        # stats.json records the build's block-max granularity; the merged
        # segments must re-block at the same size or readers would mix
        # incompatible block boundaries
        assert s.get("block_size", 128) == block_size, (
            "block_size mismatch", s.get("block_size"), block_size)
        # the k-way merge concatenates/re-encodes per-value varint streams;
        # bitpack/ef are write-once FINAL tiers — merge varint indexes, then
        # rebuild with the whole-stream codec if one is wanted
        assert s.get("docs_codec", "varint") == "varint", (
            "merge_indexes requires varint docs streams; "
            f"got docs_codec={s.get('docs_codec')!r}")

    os.makedirs(out_dir, exist_ok=True)

    # tombstones are consumed by the merge (module docstring): union the
    # per-source sets — doc sets are disjoint, so one sorted array serves
    # every source's mask probe
    dead_parts = [deletes_state.load_tombstones(d) for d in index_dirs]
    dead = (np.unique(np.concatenate(dead_parts))
            if sum(p.size for p in dead_parts)
            else np.empty(0, dtype=np.int64))

    # side tables: concatenate by file copy (live-filtered when any source
    # carries tombstones; docs must be disjoint); the disjointness check
    # runs FIRST on the thin doc-stats key column so a bad merge fails
    # fast, before any segment work.  dup_losers stays unfiltered — losers
    # were never indexed, so liveness doesn't apply to them.
    for sub in ("doc_stats", "prepped", "dup_losers"):
        sub_dead = dead if sub in ("doc_stats", "prepped") else None
        for i, d in enumerate(index_dirs):
            src = os.path.join(d, sub)
            if os.path.isdir(src):
                _copy_parquet_dir(src, os.path.join(out_dir, sub),
                                  f"src{i}", dead=sub_dead)
    di = pa.concat_tables(
        [pq.read_table(fp, columns=["doc_int"])
         for fp in glob.glob(os.path.join(out_dir, "doc_stats", "*.parquet"))]
    )["doc_int"].to_numpy(zero_copy_only=False)
    if np.unique(di).size != di.size:
        shutil.rmtree(out_dir, ignore_errors=True)
        raise ValueError("indexes share documents — dedup before merging")

    shards_tbl = pa.table(
        {"shard": pa.array(list(range(num_shards)), pa.int32())}
    )
    dirs = list(index_dirs)
    merged_root = os.path.join(out_dir, "segments_merged")
    dead_ref = ray.put(dead)

    def merge_shard(batch: pa.Table) -> pa.Table:
        dead_set = ray.get(dead_ref)
        outs = []
        for shard in batch["shard"].to_pylist():
            tables = []
            for d in dirs:
                for fp in sorted(
                    glob.glob(os.path.join(d, "segments_merged",
                                           f"shard={shard}", "*.parquet"))
                ):
                    t = pq.read_table(fp, use_threads=False).select(
                        [f.name for f in SEGMENT_SCHEMA
                         if f.name not in ("shard", "salt")]
                    )
                    if dead_set.size:
                        t = _apply_tombstones_table(t, dead_set, block_size)
                    tables.append(t)
            if tables:
                outs.append(_merge_shard_tables(tables, shard, block_size))
        return pa.concat_tables(outs) if outs else _empty_segment_table()

    (
        ray.data.from_arrow(shards_tbl)
        .repartition(num_shards)
        .map_batches(merge_shard, batch_format="pyarrow", batch_size=1)
        .write_parquet(merged_root, partition_cols=["shard"],
                       row_group_size=segment_row_group_size)
    )

    if dead.size:
        # tombstoned sources: recompute over the survivors from the
        # live-filtered doc_stats copy (the purge_deletes recipe)
        import pyarrow.dataset as pads

        ds_dir = os.path.join(out_dir, "doc_stats")
        dst = pads.dataset(ds_dir, format="parquet").to_table(
            columns=["total_words"]
        )["total_words"]
        n_docs_live = len(dst)
        total_words_live = int(
            np.sum(dst.to_numpy(zero_copy_only=False), dtype=np.int64)
        )
    else:
        n_docs_live = int(sum(s["n_docs"] for s in stats))
        total_words_live = int(sum(s["total_words"] for s in stats))
    merged_stats = {
        "n_docs": n_docs_live,
        "total_words": total_words_live,
        "num_shards": num_shards,
        "salt_bits": stats[0]["salt_bits"],
        "compacted": True,
        "block_size": block_size,
        "docs_codec": "varint",
        "merged_from": len(index_dirs),
        # tombstoned docs consumed by this merge (0 = no source had any)
        "n_purged_on_merge": int(dead.size),
    }
    merged_stats["avgdl"] = (
        merged_stats["total_words"] / merged_stats["n_docs"]
        if merged_stats["n_docs"] else 0.0
    )
    n_term_rows = 0
    for fp in glob.glob(os.path.join(merged_root, "**", "*.parquet"),
                        recursive=True):
        n_term_rows += pq.read_metadata(fp).num_rows
    merged_stats["n_term_rows"] = n_term_rows
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(merged_stats, f, indent=2)
    return merged_stats


def upsert_index(base_dir: str, delta_corpus_dir: str, out_dir: str, cfg,
                 key_cols: tuple[str, ...] = ("repo", "path")) -> dict:
    """Document UPDATE as Lucene does it: updateDocument = delete-by-key +
    add.  doc_int is content/version-derived (stages/prep.py M2 — the
    commit participates in the id), so a new version of ``(repo, path)`` is
    a NEW doc_int; the upsert (1) builds a delta index over
    ``delta_corpus_dir`` alone (cost ∝ delta, never the base), (2)
    tombstones every base doc whose key matches a delta doc (broadcast
    delta-key set + one vectorized isin scan over the base's prepped
    table), and (3) runs the tombstone-consuming :func:`merge_indexes`, so
    ``out_dir`` holds exactly the base-minus-replaced plus delta corpus.

    The base keeps its tombstone file afterwards (its readers stop serving
    the replaced versions immediately — the logical-delete contract); the
    delta index is left at ``<out_dir>.delta`` for inspection.

    Scale shape: the only non-delta-sized work is the streaming key scan
    over base/prepped and the per-shard merge; the broadcast is the delta
    key set (documented small side — deltas are increments).
    """
    import pandas as pd
    import ray.data

    from .build import build_index
    from .deletes import delete_docs

    delta_idx = out_dir + ".delta"
    if not os.path.exists(os.path.join(delta_idx, "stats.json")):
        shutil.rmtree(delta_idx, ignore_errors=True)
        build_index(delta_corpus_dir, delta_idx, cfg)

    import pyarrow.dataset as pads

    dk = pads.dataset(
        os.path.join(delta_idx, "prepped"), format="parquet"
    ).to_table(columns=list(key_cols))
    delta_keys = pd.Series(
        ["\x1f".join(vals)
         for vals in zip(*[dk[c].to_pylist() for c in key_cols])]
    ).unique()
    keys_ref = ray.put(set(delta_keys))

    def match_keys(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        key = pd.Series(batch[key_cols[0]].to_pandas(), dtype="string")
        for c in key_cols[1:]:
            key = key + "\x1f" + pd.Series(batch[c].to_pandas(),
                                           dtype="string")
        return batch.filter(
            pa.array(key.isin(ks).to_numpy(dtype=bool))
        ).select(["doc_int"])

    replaced = (
        ray.data.read_parquet(
            os.path.join(base_dir, "prepped"), file_extensions=["parquet"],
            columns=["doc_int", *key_cols],
        )
        .map_batches(match_keys, batch_format="pyarrow")
        .to_pandas()["doc_int"]
        .to_numpy()
        .astype(np.int64)
    )
    if replaced.size:
        delete_docs(base_dir, replaced)
    stats = merge_indexes([base_dir, delta_idx], out_dir)
    stats["n_replaced"] = int(replaced.size)
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    return stats

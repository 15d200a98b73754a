"""Index build pipeline: corpus parquet -> posting-list segments (+ documents
metadata, doc stats, build manifest).

Ray-Data-native replacement for the reference's indexer job
(indexer/Main.java:32-174: producer/consumer queues + nested thread pools +
MongoDB write-behind).  Every stage is a Dataset transform; the posting
construction is a ``groupby`` shuffle instead of merge-on-write upserts
(SURVEY.md §3.4).

Phases (each checkpointed with a ``_DONE`` marker; a rerun skips completed
phases — the per-partition lineage + metrics live in ``manifest.json``,
satisfying the north_rule resumability requirement):

  1. prep      corpus -> prepped/          (ids, sha256, field split) — this
               doubles as the ``Documents`` table (S7: the reference stores
               title/description/content per doc, MongoDBIndexStore.java:208-228)
  2. losers    prepped -> dup_losers/      exact-dup losers (D1/D2; keep min
               doc_id per content_sha256)
  3. postings  prepped -> postings/        tokenize map side (T1/A1/A2);
               the written intermediate IS the map-side shuffle spill, making
               the reduce side restartable without re-tokenizing
  4. doc_stats postings -> doc_stats/      totalWords per doc (A2) — derived
               from the replicated doc_tw column: per-batch local dedup, then
               a tiny groupby over ~1 row per (doc, block)
  5. segments  postings -> segments/       THE shuffle: groupby(part) ->
               encode salted posting-list runs (A3)
  6. merged    segments -> segments_merged/ per-term run merge (streaming
               concatenation of sorted runs; segment-merge primitive)
  7. stats     global stats.json (N, avgdl, n_terms) for BM25 (A11 analog)
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from functools import partial

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..config import BuildConfig
from ..stages.encode import encode_part_dirs, merge_shard_runs
from ..stages.prep import make_loser_filter, prep_batch
from ..stages.tokenize import TokenizeBatch

PREPPED = "prepped"
LOSERS = "dup_losers"
POSTINGS = "postings"
DOC_STATS = "doc_stats"
SEGMENTS = "segments"
MERGED = "segments_merged"


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_DONE"))


def _mark_done(path: str) -> None:
    with open(os.path.join(path, "_DONE"), "w") as f:
        f.write("ok")


def _normalize_shard(batch: pa.Table) -> pa.Table:
    """Partition columns read back from hive dirs may arrive as strings or
    dictionary arrays; normalize to int32 for grouping/rewriting."""
    idx = batch.schema.get_field_index("shard")
    col = batch.column(idx)
    if pa.types.is_dictionary(col.type):
        col = col.cast(col.type.value_type)
    col = col.cast(pa.int32())
    return batch.set_column(idx, "shard", col)


def _local_docstat_dedup(batch: pa.Table) -> pa.Table:
    doc = batch["doc_int"].to_numpy(zero_copy_only=False)
    tw = batch["doc_tw"].to_numpy(zero_copy_only=False)
    uniq, first = np.unique(doc, return_index=True)
    return pa.table(
        {
            "doc_int": pa.array(uniq, pa.int64()),
            "doc_tw": pa.array(tw[first], pa.int32()),
        }
    )


def _parquet_row_count(root: str) -> int:
    """Row count from parquet footers (no Ray job, no data read)."""
    import glob as _glob

    import pyarrow.parquet as pq

    total = 0
    for fp in _glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True):
        total += pq.read_metadata(fp).num_rows
    return total


def load_losers(index_dir: str) -> np.ndarray:
    import pyarrow.dataset as pads

    path = os.path.join(index_dir, LOSERS)
    tbl = pads.dataset(path, format="parquet").to_table(columns=["doc_int"])
    return np.sort(tbl["doc_int"].to_numpy(zero_copy_only=False).astype(np.int64))


def build_index(
    corpus_path: str,
    index_dir: str,
    config: BuildConfig | None = None,
) -> dict:
    """Run (or resume) the full index build; returns the manifest dict."""
    cfg = config or BuildConfig()
    os.makedirs(index_dir, exist_ok=True)
    manifest_path = os.path.join(index_dir, "manifest.json")
    manifest: dict = {"config": dataclasses.asdict(cfg), "phases": {}}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            old = json.load(f)
        manifest["phases"].update(old.get("phases", {}))

    def record(phase: str, t0: float, **extra) -> None:
        manifest["phases"][phase] = {
            "seconds": round(time.time() - t0, 3),
            **extra,
        }
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=2)

    # ---- phase 1: prep ----------------------------------------------------
    prepped_dir = os.path.join(index_dir, PREPPED)
    if not _done(prepped_dir):
        t0 = time.time()
        ds = ray.data.read_parquet(corpus_path)
        ds = ds.map_batches(prep_batch, batch_format="pyarrow")
        ds.write_parquet(prepped_dir)
        _mark_done(prepped_dir)
        record("prep", t0)

    # ---- phase 2: dup losers ---------------------------------------------
    losers_dir = os.path.join(index_dir, LOSERS)
    if not _done(losers_dir):
        t0 = time.time()
        ds = ray.data.read_parquet(
            prepped_dir, columns=["content_sha256", "doc_int"]
        )
        # vectorized keep-min-per-sha: aggregate (Min, Count) shuffles only
        # (sha, doc_int) pairs through C kernels; only DUPLICATED shas (a
        # small set at sane dup rates) come back to the driver and are
        # broadcast for the loser scan — no per-group Python calls.
        agg = ds.groupby("content_sha256").aggregate(
            Min("doc_int", alias_name="winner"),
            Count(alias_name="n_copies"),
        )

        def only_dups(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.greater(batch["n_copies"], pa.scalar(1)))

        dup_tbl = agg.map_batches(only_dups, batch_format="pyarrow").to_pandas()
        winners = dict(zip(dup_tbl["content_sha256"], dup_tbl["winner"]))
        winners_ref = ray.put(winners)

        def mark_losers(batch: pa.Table) -> pa.Table:
            w = ray.get(winners_ref)
            shas = batch["content_sha256"].to_pylist()
            ints = batch["doc_int"].to_numpy(zero_copy_only=False)
            keep = [
                int(ints[i])
                for i, s in enumerate(shas)
                if s in w and int(ints[i]) != w[s]
            ]
            return pa.table({"doc_int": pa.array(keep, pa.int64())})

        ds.map_batches(mark_losers, batch_format="pyarrow").write_parquet(losers_dir)
        _mark_done(losers_dir)
        record("losers", t0, n_losers=_parquet_row_count(losers_dir))

    loser_ints = load_losers(index_dir)

    # ---- phase 3: postings (tokenize map side) ---------------------------
    postings_dir = os.path.join(index_dir, POSTINGS)
    if not _done(postings_dir):
        t0 = time.time()
        ds = ray.data.read_parquet(
            prepped_dir, columns=["doc_int", "title", "description", "content"]
        )
        ds = ds.map_batches(make_loser_filter(loser_ints), batch_format="pyarrow")
        if cfg.tokenize_concurrency:
            ds = ds.map_batches(
                TokenizeBatch,
                fn_constructor_args=(cfg,),
                batch_format="pyarrow",
                batch_size=cfg.tokenize_batch_size,
                concurrency=cfg.tokenize_concurrency,
            )
        else:
            ds = ds.map_batches(
                TokenizeBatch(cfg),
                batch_format="pyarrow",
                batch_size=cfg.tokenize_batch_size,
            )
        # hash-partitioned write = THE shuffle's map side, materialized to
        # storage (classic MapReduce exchange): the reduce side then reads
        # one part directory per task with no in-memory all-to-all, and a
        # failed reduce resumes per part.  Coalesce first so file count per
        # part dir stays bounded (postings_write_blocks x num_parts total).
        ds = ds.repartition(cfg.postings_write_blocks)
        ds.write_parquet(postings_dir, partition_cols=["part"])
        _mark_done(postings_dir)
        record("postings", t0)

    # ---- phase 4: segment encode (reduce side of THE shuffle) ------------
    segments_dir = os.path.join(index_dir, SEGMENTS)
    doc_stats_parts_dir = os.path.join(index_dir, "doc_stats_parts")
    if not _done(segments_dir):
        t0 = time.time()
        import glob as _glob

        os.makedirs(doc_stats_parts_dir, exist_ok=True)
        part_dirs = sorted(
            _glob.glob(os.path.join(postings_dir, "part=*"))
        )
        parts_tbl = pa.table(
            {
                "part": pa.array(
                    [int(os.path.basename(p).split("=")[1]) for p in part_dirs],
                    pa.int32(),
                ),
                "path": pa.array(part_dirs, pa.string()),
            }
        )
        enc = ray.data.from_arrow(parts_tbl).map_batches(
            partial(encode_part_dirs, cfg=cfg,
                    doc_stats_parts_dir=doc_stats_parts_dir),
            batch_format="pyarrow",
            batch_size=1,           # one part per task: bounded memory
        )
        enc.write_parquet(segments_dir, partition_cols=["shard"])
        _mark_done(segments_dir)
        record("segments", t0, n_parts=len(part_dirs))

    # ---- phase 5: doc stats (from the piggybacked per-part partials) -----
    doc_stats_dir = os.path.join(index_dir, DOC_STATS)
    if not _done(doc_stats_dir):
        t0 = time.time()
        ds = ray.data.read_parquet(doc_stats_parts_dir)
        ds = ds.map_batches(_local_docstat_dedup, batch_format="pyarrow")
        stats = ds.groupby("doc_int").aggregate(
            Max("doc_tw", alias_name="total_words")
        )
        stats.write_parquet(doc_stats_dir)
        _mark_done(doc_stats_dir)
        record("doc_stats", t0)

    # ---- phase 6: merge runs ---------------------------------------------
    merged_dir = os.path.join(index_dir, MERGED)
    if cfg.compact_segments and not _done(merged_dir):
        t0 = time.time()
        ds = ray.data.read_parquet(segments_dir)
        ds = ds.map_batches(_normalize_shard, batch_format="pyarrow")
        merged = ds.groupby("shard").map_groups(
            partial(merge_shard_runs, block_size=cfg.block_size),
            batch_format="pyarrow",
        )
        merged.write_parquet(merged_dir, partition_cols=["shard"])
        _mark_done(merged_dir)
        record("merge", t0)

    # ---- phase 7: global stats -------------------------------------------
    stats_path = os.path.join(index_dir, "stats.json")
    if not os.path.exists(stats_path):
        t0 = time.time()
        agg = ray.data.read_parquet(doc_stats_dir).aggregate(
            Sum("total_words", alias_name="tw"),
            Count(alias_name="n_docs"),
        )
        n_docs = int(agg["n_docs"])
        total_words = int(agg["tw"]) if agg["tw"] is not None else 0
        seg_src = merged_dir if cfg.compact_segments else segments_dir
        n_term_rows = _parquet_row_count(seg_src)
        stats = {
            "n_docs": n_docs,
            "total_words": total_words,
            "avgdl": (total_words / n_docs) if n_docs else 0.0,
            "n_term_rows": n_term_rows,
            "num_shards": cfg.num_shards,
            "salt_bits": cfg.salt_bits,
            "compacted": cfg.compact_segments,
        }
        with open(stats_path, "w") as f:
            json.dump(stats, f, indent=2)
        record("stats", t0, **stats)

    return manifest

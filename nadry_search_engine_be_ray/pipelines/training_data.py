"""End-to-end training-data curation pipeline over a documents table.

Composes the training-data stages (the 100 TB use case from the task brief)
into one streaming Dataset flow:

    read -> quality gate (min whitespace tokens AND stopword-ratio cap,
            both vectorized per batch)
         -> exact dedup (losers of each identical-text group computed with a
            slim (sha, doc_id) shuffle, broadcast-filtered when the loser set
            is under ``max_broadcast_losers`` — the same small-side pattern
            as build.py phase 2 — else a full keep-min shuffle fallback)
         -> near-dup dedup (MinHash-LSH distributed-verified pairs -> drop
            the higher doc_id of every confirmed pair; transitive clusters
            are available separately via stages.dedup.near_dup_clusters)
         -> per-doc stats (token counts, language id)
         -> curated table

Every stage is a `map_batches` / shuffle primitive documented in its own
module; this pipeline only wires them.  Metrics are derived from the
already-materialized small sides (loser sets, pair sets) — the only count()
is the input row count, which for a fresh parquet read is metadata-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.dedup import add_text_sha, minhash_lsh_pairs
from ..stages.partitioning import fused_parts
from ..stages.textstats import EN_STOPS, lang_id_batch, token_count_batch


def _ws_tokens(text: str) -> list[str]:
    t = (text or "").strip()
    return t.split() if t else []


def curate(
    docs_ds: "ray.data.Dataset",
    min_tokens: int = 3,
    max_stop_ratio: float = 0.9,
    near_dup_threshold: float = 0.5,
    max_broadcast_losers: int = 5_000_000,
) -> tuple["ray.data.Dataset", dict]:
    """Returns (curated Dataset, per-stage metrics).  ``metrics`` is fully
    populated except ``curated`` / ``after_exact_dedup``, which the caller
    finalizes from the materialized row count via ``finalize_metrics``
    (no extra counting pass)."""
    n_parts_fused = fused_parts(docs_ds)
    import ray

    metrics: dict[str, int] = {}
    # metadata-only for a fresh parquet read; documents the input scale
    metrics["input"] = int(docs_ds.count())

    # --- quality gate (vectorized per batch) ---------------------------
    def quality_gate(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        keep = np.zeros(len(texts), dtype=bool)
        for i, t in enumerate(texts):
            toks = _ws_tokens(t)
            if len(toks) < min_tokens:
                continue
            stop = sum(x.lower() in EN_STOPS for x in toks) / len(toks)
            keep[i] = stop <= max_stop_ratio
        return batch.filter(pa.array(keep))

    quality = docs_ds.map_batches(quality_gate, batch_format="pyarrow")

    # --- exact dedup: LOSERS per identical text (small side) ------------
    def to_sha_ids(batch: pa.Table) -> pa.Table:
        withsha = add_text_sha(batch)
        return withsha.select(["text_sha256", "doc_id"])

    def add_part(batch: pa.Table) -> pa.Table:
        import zlib

        h = np.array(
            [zlib.crc32(s.encode()) for s in batch["text_sha256"].to_pylist()],
            dtype=np.int64,
        ) if len(batch) else np.empty(0, np.int64)
        return batch.append_column("part", pa.array(h % n_parts_fused, pa.int64()))

    def emit_losers_partition(group: pa.Table) -> pa.Table:
        # one sorted pass per coarse sha partition: losers = every row of a
        # sha segment except its min-doc_id first
        if len(group) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        de = group["text_sha256"].combine_chunks().dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, codes))
        sc, sid = codes[order], ids[order]
        first = np.concatenate(([True], sc[1:] != sc[:-1]))
        return pa.table({"doc_id": pa.array(sid[~first], pa.int64())})

    losers_ds = (
        quality.map_batches(to_sha_ids, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(emit_losers_partition, batch_format="pyarrow")
        .materialize()
    )
    n_exact_losers = int(losers_ds.count())
    metrics["exact_losers"] = n_exact_losers

    if n_exact_losers == 0:
        deduped = quality
    elif n_exact_losers <= max_broadcast_losers:
        exact_losers = np.sort(
            losers_ds.to_pandas()["doc_id"].to_numpy(np.int64)
        )
        losers_ref = ray.put(exact_losers)

        def drop_exact_losers(batch: pa.Table) -> pa.Table:
            from ..stages.prep import sorted_membership_mask

            l = ray.get(losers_ref)
            if l.size == 0:
                return batch
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~sorted_membership_mask(l, ids)))

        deduped = quality.map_batches(drop_exact_losers, batch_format="pyarrow")
    else:
        # loser set too big to broadcast: full keep-min shuffle instead
        print(
            f"curate: {n_exact_losers} exact-dup losers exceed the broadcast "
            f"cap ({max_broadcast_losers}); falling back to shuffle dedup"
        )

        def keep_min_row(group: pa.Table) -> pa.Table:
            ids = group["doc_id"].to_numpy(zero_copy_only=False)
            return group.take(
                pa.array([int(np.argmin(ids))], pa.int64())
            ).drop_columns(["text_sha256"])

        deduped = (
            quality.map_batches(
                lambda b: add_text_sha(b), batch_format="pyarrow"
            )
            .groupby("text_sha256")
            .map_groups(keep_min_row, batch_format="pyarrow")
        )

    # --- near-dup dedup: drop the higher id of each confirmed pair ------
    # (pairwise drop, not transitive closure: b is near a, but a third doc
    #  near b only drops if it pairs with a surviving doc itself — matches
    #  the SQL-oracle semantics; see near_dup_clusters for transitive CC)
    pairs_ds = minhash_lsh_pairs(deduped, threshold=near_dup_threshold) \
        .materialize()
    n_pairs = int(pairs_ds.count())
    metrics["near_dup_pairs"] = n_pairs

    if n_pairs == 0:
        metrics["near_dup_losers"] = 0
        curated = deduped
    elif n_pairs <= max_broadcast_losers:
        # small side: broadcast the sorted loser ids once (same pattern as
        # the exact-dup stage above)
        pairs = pairs_ds.to_pandas()
        near_losers = np.sort(pairs["b"].unique().astype(np.int64))
        metrics["near_dup_losers"] = int(near_losers.size)
        nl_ref = ray.put(near_losers)

        def drop_near_losers(batch: pa.Table) -> pa.Table:
            from ..stages.prep import sorted_membership_mask

            l = ray.get(nl_ref)
            if l.size == 0:
                return batch
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~sorted_membership_mask(l, ids)))

        curated = deduped.map_batches(drop_near_losers, batch_format="pyarrow")
    else:
        # loser set too big to broadcast (a high-duplication 100 TB corpus
        # can make it unbounded): distributed anti join instead — union the
        # doc rows with loser-marker rows and keep only marker-free groups
        print(
            f"curate: {n_pairs} near-dup pairs exceed the broadcast cap "
            f"({max_broadcast_losers}); falling back to shuffle anti join"
        )
        # NOTE: this fallback pins curate's two-column (doc_id, text)
        # schema; extend to_markers/to_rows/keep_non_losers together if
        # curate's input ever grows a column (the broadcast path above is
        # schema-agnostic)
        doc_schema_cols = ["doc_id", "text"]

        def to_markers(batch: pa.Table) -> pa.Table:
            b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(b, pa.int64()),
                    "text": pa.nulls(len(b), pa.string()),
                    "__loser__": pa.array(np.ones(len(b), np.int8), pa.int8()),
                }
            )

        def to_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "text": batch["text"].cast(pa.string()),
                    "__loser__": pa.array(
                        np.zeros(len(batch), np.int8), pa.int8()
                    ),
                }
            )

        markers = pairs_ds.map_batches(to_markers, batch_format="pyarrow")
        rows = deduped.map_batches(to_rows, batch_format="pyarrow")

        def keep_non_losers(group: pa.Table) -> pa.Table:
            flags = group["__loser__"].to_numpy(zero_copy_only=False)
            if flags.max() > 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "text": pa.array([], pa.string()),
                    }
                )
            return group.select(doc_schema_cols).slice(0, 1)

        curated = (
            rows.union(markers)
            .groupby("doc_id")
            .map_groups(keep_non_losers, batch_format="pyarrow")
        )
        # loser count without driver materialization: distinct b ids
        metrics["near_dup_losers"] = int(
            pairs_ds.select_columns(["b"]).groupby("b").count().count()
        )

    # --- enrich with stats ----------------------------------------------
    def enrich(batch: pa.Table) -> pa.Table:
        counts = token_count_batch(batch)
        lang = lang_id_batch(batch)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": batch["text"],
                "n_tokens": counts["n_word_tokens"],
                "pred_lang": lang["pred_lang"],
            }
        )

    out = curated.map_batches(enrich, batch_format="pyarrow")
    return out, metrics


def curate_to_parquet(
    docs_ds: "ray.data.Dataset",
    out_dir: str,
    num_partitions: int = 16,
    **curate_kwargs,
) -> dict:
    """Run curate() and write the curated table as partitioned parquet —
    one directory per doc_id-hash partition with a _DONE marker, so a
    failed run re-executes only the write, and downstream consumers can
    read partitions independently (the brief's resumable-output rule:
    never one giant file)."""
    import os

    import shutil

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        out = ray.data.read_parquet(out_dir)
        return {"skipped": True, "rows": int(out.count())}
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        # _DONE absent but files present = a crashed previous write; Ray
        # writes uniquely-named fragments per run, so stale files would
        # survive the rerun and duplicate rows (build.py's _fresh pattern)
        shutil.rmtree(out_dir)

    curated, metrics = curate(docs_ds, **curate_kwargs)

    def add_part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "part", pa.array(ids % num_partitions, pa.int32())
        )

    os.makedirs(out_dir, exist_ok=True)
    curated.map_batches(add_part, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["part"]
    )
    with open(done, "w") as f:
        f.write("ok")
    rows = int(ray.data.read_parquet(out_dir).count())
    finalize_metrics(metrics, rows)
    metrics["skipped"] = False
    return metrics


def finalize_metrics(metrics: dict, curated_rows: int) -> dict:
    """Derive the row-count metrics from the materialized result instead of
    extra counting passes: winners = curated + near-dup losers."""
    metrics["curated"] = int(curated_rows)
    metrics["after_exact_dedup"] = int(curated_rows + metrics["near_dup_losers"])
    return metrics


def q_training_pipeline(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out, metrics = curate(ds)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df = df[["doc_id", "n_tokens", "pred_lang"]]
    finalize_metrics(metrics, len(df))
    # metrics ride along as attrs for tests; the driver hashes the table
    df.attrs["metrics"] = metrics
    return df

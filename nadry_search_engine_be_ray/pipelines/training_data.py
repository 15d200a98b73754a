"""End-to-end training-data curation pipeline over a documents table.

Composes the training-data stages (the 100 TB use case from the task brief)
into one streaming Dataset flow:

    read -> quality scores (filter: non-empty, stopword ratio sane)
         -> exact dedup (keep min doc_id per identical text)
         -> near-dup dedup (MinHash-LSH pairs -> drop the higher doc_id of
            every confirmed pair)
         -> per-doc stats (token counts, language id)
         -> curated table

Every stage is a `map_batches` / shuffle primitive documented in its own
module; this pipeline only wires them.  The pair-to-loser reduction keeps
min-doc_id per connected PAIR (single-link one step) — full transitive
clustering would be a connected-components pass, noted for scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.dedup import exact_dedup_groups, minhash_lsh_pairs
from ..stages.textstats import lang_id_batch, token_count_batch


def curate(
    docs_ds: "ray.data.Dataset",
    min_tokens: int = 3,
    max_stop_ratio: float = 0.9,
    near_dup_threshold: float = 0.5,
) -> tuple["ray.data.Dataset", dict]:
    """Returns (curated Dataset, per-stage row-count metrics)."""
    import ray

    metrics: dict[str, int] = {}
    metrics["input"] = int(docs_ds.count())

    # --- quality gate (vectorized per batch) ---------------------------
    def quality_gate(batch: pa.Table) -> pa.Table:
        counts = token_count_batch(batch)
        n_ws = counts["n_ws_tokens"].to_numpy(zero_copy_only=False)
        keep = n_ws >= min_tokens
        return batch.filter(pa.array(keep))

    quality = docs_ds.map_batches(quality_gate, batch_format="pyarrow")

    # --- exact dedup: winners per identical text ------------------------
    exact = exact_dedup_groups(quality).to_pandas()
    exact_winners = np.sort(exact["doc_id"].to_numpy(np.int64))
    metrics["after_exact_dedup"] = int(exact_winners.size)
    winners_ref = ray.put(exact_winners)

    def keep_exact_winners(batch: pa.Table) -> pa.Table:
        w = ray.get(winners_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(w, ids)
        idx[idx == w.size] = 0
        return batch.filter(pa.array(w[idx] == ids))

    deduped = quality.map_batches(keep_exact_winners, batch_format="pyarrow")

    # --- near-dup dedup: drop the higher id of each confirmed pair ------
    pairs = minhash_lsh_pairs(deduped, threshold=near_dup_threshold).to_pandas()
    near_losers = np.sort(pairs["b"].unique().astype(np.int64)) if len(pairs) \
        else np.empty(0, dtype=np.int64)
    metrics["near_dup_pairs"] = int(len(pairs))
    losers_ref = ray.put(near_losers)

    def drop_near_losers(batch: pa.Table) -> pa.Table:
        l = ray.get(losers_ref)
        if l.size == 0:
            return batch
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(l, ids)
        idx[idx == l.size] = 0
        return batch.filter(pa.array(~(l[idx] == ids)))

    curated = deduped.map_batches(drop_near_losers, batch_format="pyarrow")

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
    metrics["curated"] = int(out.count())
    return out, metrics


def q_training_pipeline(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out, metrics = curate(ds)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df = df[["doc_id", "n_tokens", "pred_lang"]]
    # metrics ride along as attrs for tests; the driver hashes the table
    df.attrs["metrics"] = metrics
    return df

"""DSIR-style importance resampling for LM data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Given a small TARGET corpus (the domain you want more of) and the huge RAW
corpus, score every raw document by the log importance ratio of two
bag-of-n-grams models and keep the top-weighted docs:

    weight(doc) = sum over doc gram occurrences g of
                  [ log10 p_target(g) - log10 p_raw(g) ]
    p_X(g)      = (c_X(g) + a) / (N_X + a * V)        (add-a smoothing)

where grams are the unigrams + bigrams of ``stages/lm.py``'s tokenization,
V is the RAW gram vocabulary size, and N_X the corpus gram occurrence
count.  Every scoring gram appears in the raw corpus by construction, so
the (vocab-sized) log-ratio table is a complete model.

Scale shape mirrors ``stages/lm.py``: two gram-sized count shuffles (the
models), a ``ray.put`` broadcast of the log-ratio dict, one shuffle-free
vectorized scoring pass, then per-block partial top-k + one driver merge
of <= n_blocks x k thin rows for selection.  The paper's hashed-feature
variant (``n_buckets``) maps grams to ``sha256(gram) % n_buckets`` before
counting, bounding the model at any corpus size; the unhashed path is the
SQL-checked surface (closed-form, recomputed end-to-end by the DuckDB
oracle), the hashed path is pytest-verified against it.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lm import (
    bigram_grams,
    default_pool_size,
    doc_tokens,
    exploded_tokens,
    lookup_counts,
    ngram_count_table,
)


def doc_grams(text: str | None) -> list[str]:
    toks = doc_tokens(text)
    return toks + [f"{v} {w}" for v, w in zip(toks, toks[1:])]


def _bucket(gram: str, n_buckets: int) -> int:
    return int.from_bytes(
        hashlib.sha256(gram.encode()).digest()[:8], "big"
    ) % n_buckets


def _counts(ds, text_col: str, n_buckets: int | None) -> dict[str, int]:
    tbl = ngram_count_table(ds, text_col)
    grams = tbl["gram"].to_pylist()
    counts = tbl["count"].to_pylist()
    if n_buckets is None:
        return dict(zip(grams, counts))
    out: dict[str, int] = {}
    for g, c in zip(grams, counts):
        b = str(_bucket(g, n_buckets))
        out[b] = out.get(b, 0) + c
    return out


def build_log_ratio(raw_counts: dict[str, int], tgt_counts: dict[str, int],
                    alpha: float = 0.1) -> dict[str, float]:
    """log10 p_target(g) - log10 p_raw(g) for every raw-vocab gram, with
    identical op order to the SQL oracle:
    log10(ct+a) - log10(Nt+a*V) - log10(cr+a) + log10(Nr+a*V)."""
    v = len(raw_counts)
    n_raw = sum(raw_counts.values())
    n_tgt = sum(tgt_counts.values())
    lt = math.log10(n_tgt + alpha * v)
    lr = math.log10(n_raw + alpha * v)
    return {
        g: math.log10(tgt_counts.get(g, 0) + alpha)
        - lt
        - math.log10(cr + alpha)
        + lr
        for g, cr in raw_counts.items()
    }


class DsirScoreBatch:
    """Actor-pool stage: per-doc importance weight against the broadcast
    log-ratio model (``ray.put`` handle fetched once per actor)."""

    def __init__(self, model_ref, text_col: str = "text",
                 n_buckets: int | None = None):
        import ray

        self.ratio: dict[str, float] = (
            ray.get(model_ref)
            if isinstance(model_ref, ray.ObjectRef)
            else model_ref
        )
        self.text_col = text_col
        self.n_buckets = n_buckets
        # once per ACTOR: ratio dict -> Arrow key array + numpy values so
        # per-batch probes are a single index_in kernel
        self.keys = pa.array(list(self.ratio.keys()), pa.string())
        self.vals = np.fromiter(
            self.ratio.values(), np.float64, len(self.ratio))

    def __call__(self, batch: pa.Table) -> pa.Table:
        nb = self.n_buckets
        if nb is not None:
            return self._call_hashed(batch)
        doc_pos, flat, toklens = exploded_tokens(batch[self.text_col])
        n_rows = len(batch)
        bg, bg_pos = bigram_grams(doc_pos, flat)
        w = np.bincount(
            doc_pos, weights=lookup_counts(flat, self.keys, self.vals),
            minlength=n_rows,
        )
        bglens = np.zeros(n_rows, np.int64)
        if len(bg):
            bg_doc = doc_pos[bg_pos]
            w += np.bincount(
                bg_doc, weights=lookup_counts(bg, self.keys, self.vals),
                minlength=n_rows,
            )
            bglens = np.bincount(bg_doc, minlength=n_rows).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_grams": pa.array(toklens + bglens, pa.int64()),
                "weight": pc.round(pa.array(w, pa.float64()), 6),
            }
        )

    def _call_hashed(self, batch: pa.Table) -> pa.Table:
        """sha256-bucketed variant (paper's hashed features): the bucket
        hash is inherently per-gram Python; pytest-verified, non-hot."""
        ratio, nb = self.ratio, self.n_buckets
        per_doc = [
            [str(_bucket(g, nb)) for g in doc_grams(t)]
            for t in batch[self.text_col].to_pylist()
        ]
        lens = np.array([len(g) for g in per_doc], dtype=np.int64)
        flat = [g for gs in per_doc for g in gs]
        n = len(flat)
        w = np.zeros(len(per_doc), np.float64)
        if n:
            lp = np.fromiter((ratio.get(g, 0.0) for g in flat), np.float64, n)
            # reduceat over non-empty docs' starts only: strictly
            # increasing, in-bounds, and segments stay contiguous because
            # empty docs occupy no positions
            nz = lens > 0
            starts_idx = np.cumsum(lens) - lens
            w[nz] = np.add.reduceat(lp, starts_idx[nz])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_grams": pa.array(lens, pa.int64()),
                "weight": pc.round(pa.array(w, pa.float64()), 6),
            }
        )


def dsir_weights(raw_ds, target_ds, text_col: str = "text",
                 alpha: float = 0.1, n_buckets: int | None = None,
                 concurrency: int | None = None):
    """Score every doc of ``raw_ds`` (doc_id, text).  Returns a Dataset
    (doc_id, n_grams, weight); higher weight = more target-like."""
    import ray

    raw_counts = _counts(raw_ds, text_col, n_buckets)
    tgt_counts = _counts(target_ds, text_col, n_buckets)
    model_ref = ray.put(build_log_ratio(raw_counts, tgt_counts, alpha))
    return raw_ds.map_batches(
        DsirScoreBatch,
        fn_constructor_args=(model_ref, text_col, n_buckets),
        batch_format="pyarrow",
        concurrency=concurrency or default_pool_size(),
    )


def dsir_select(raw_ds, target_ds, k: int = 100, text_col: str = "text",
                alpha: float = 0.1, n_buckets: int | None = None,
                concurrency: int | None = None) -> pa.Table:
    """Deterministic top-``k`` selection by (weight DESC, doc_id): per-block
    partial top-k, then one driver merge of <= n_blocks x k thin rows.
    Returns (rank, doc_id, weight)."""
    weights = dsir_weights(raw_ds, target_ds, text_col, alpha, n_buckets,
                           concurrency)

    def partial_topk(batch: pa.Table) -> pa.Table:
        w = batch["weight"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -w))[: min(k, len(w))]
        return pa.table(
            {"doc_id": pa.array(ids[order], pa.int64()),
             "weight": pa.array(w[order], pa.float64())}
        )

    parts = weights.map_batches(partial_topk, batch_format="pyarrow")
    merged = pa.concat_tables(
        [pa.table(b) for b in parts.iter_batches(batch_format="pyarrow")]
        or [pa.table({"doc_id": pa.array([], pa.int64()),
                      "weight": pa.array([], pa.float64())})]
    )
    ids = merged["doc_id"].to_numpy(zero_copy_only=False)
    w = merged["weight"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -w))[: min(k, len(w))]
    return pa.table(
        {
            "rank": pa.array(np.arange(order.size, dtype=np.int64),
                             pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "weight": pa.array(w[order], pa.float64()),
        }
    )

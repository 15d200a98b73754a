"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

A training-data pipeline at 100 TB needs to TRAIN its tokenizer over the
corpus, not just apply one (Sennrich et al. 2016; GPT-2-style no
end-of-word marker — merges simply never cross word boundaries).  The
expensive part — pair-frequency counting over every word occurrence — is
the distributed primitive here; the merge-selection loop then runs over
the WORD HISTOGRAM (vocab-sized, corpus-frequency weighted), which is the
standard trick: one corpus-sized shuffle total, then iterations touch only
word types.

Scale shape:

* ``word_histogram`` — per-batch partial ``Counter`` (the map-side
  combine) → ``groupby(word).sum``: the ONE corpus-sized exchange, output
  is vocab-sized.
* each merge iteration — ``map_batches`` partial pair counts over the
  histogram (pre-aggregated per batch, thin (a, b, n) rows) →
  ``groupby(a, b).sum`` → partial top-1 per block → driver picks the
  winner from ≤ n_blocks rows and broadcasts it.  Iteration cost is
  histogram-sized, not corpus-sized.
* deterministic: ties break on (count DESC, a ASC, b ASC); results are
  independent of partitioning.

``pair_counts`` (the single-pass primitive over raw documents) is the
SQL-checkable surface — DuckDB re-derives intra-word adjacent char pairs
from scratch.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from .textstats import _WORD


def _batch_word_counts(batch: pa.Table, text_col: str) -> pa.Table:
    import pyarrow.compute as pc

    from .lm import exploded_tokens

    _, flat, _ = exploded_tokens(batch[text_col])
    if len(flat) == 0:
        return pa.table(
            {"word": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    g = pa.table({"word": flat}).group_by("word").aggregate(
        [("word", "count")]
    )
    order = pc.sort_indices(g["word"])
    return pa.table(
        {
            "word": g["word"].take(order),
            "n": pc.cast(g["word_count"].take(order), pa.int64()),
        }
    )


def word_histogram(ds, text_col: str = "text"):
    """Corpus word histogram: (word, n) — partial counts per batch, one
    groupby-sum exchange."""
    from ray.data.aggregate import Sum

    return (
        ds.map_batches(
            lambda b: _batch_word_counts(b, text_col), batch_format="pyarrow"
        )
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )


def pair_counts(ds, text_col: str = "text", top_k: int | None = None):
    """Adjacent intra-word character-pair counts over every word
    OCCURRENCE in the corpus (the first BPE iteration's statistics).
    Returns (a, b, n) sorted by (n DESC, a, b), optionally top-k."""
    from ray.data.aggregate import Sum

    def batch_pairs(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch[text_col].to_pylist():
            for w in _WORD.findall((text or "").lower()):
                for i in range(len(w) - 1):
                    c[(w[i], w[i + 1])] += 1
        keys = sorted(c)
        return pa.table(
            {
                "a": pa.array([k[0] for k in keys], pa.string()),
                "b": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array([c[k] for k in keys], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(batch_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
    )
    out = agg.sort(["n", "a", "b"], descending=[True, False, False])
    if top_k is not None:
        out = out.limit(top_k)
    return out


def _sym_pair_partial(batch: pa.Table) -> pa.Table:
    """Histogram batch (syms list, n) → thin aggregated (a, b, n) rows."""
    c: Counter = Counter()
    for syms, n in zip(batch["syms"].to_pylist(), batch["n"].to_pylist()):
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += n
    keys = sorted(c)
    return pa.table(
        {
            "a": pa.array([k[0] for k in keys], pa.string()),
            "b": pa.array([k[1] for k in keys], pa.string()),
            "n": pa.array([c[k] for k in keys], pa.int64()),
        }
    )


def _top1(batch: pa.Table) -> pa.Table:
    """Partial argmax under (n DESC, a ASC, b ASC) — one row per block."""
    if len(batch) == 0 or "n" not in batch.column_names:
        # typed empty: zero-row groupby blocks can carry an EMPTY schema
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    df = batch.sort_by(
        [("n", "descending"), ("a", "ascending"), ("b", "ascending")]
    )
    return df.slice(0, 1)


def _merge_syms(syms: list[str], a: str, b: str) -> list[str]:
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(ds, n_merges: int = 50, text_col: str = "text",
              min_count: int = 1) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges over the corpus.  Returns the ordered
    merge list [(a, b), ...]; stops early when no pair reaches
    ``min_count``."""
    from ray.data.aggregate import Sum

    hist = word_histogram(ds, text_col)

    def to_syms(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "syms": pa.array(
                    [list(w) for w in batch["word"].to_pylist()],
                    pa.list_(pa.string()),
                ),
                "n": batch["n"],
            }
        )

    cur = hist.map_batches(to_syms, batch_format="pyarrow").materialize()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            cur.map_batches(_sym_pair_partial, batch_format="pyarrow")
            .groupby(["a", "b"])
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(_top1, batch_format="pyarrow")
            .to_pandas()  # ≤ n_blocks rows — the bounded combine
        )
        if len(top) == 0:
            break
        top = top.sort_values(
            ["n", "a", "b"], ascending=[False, True, True]
        ).iloc[0]
        if int(top["n"]) < min_count:
            break
        a, b = str(top["a"]), str(top["b"])
        merges.append((a, b))

        def apply_merge(batch: pa.Table, a=a, b=b) -> pa.Table:
            return pa.table(
                {
                    "syms": pa.array(
                        [
                            _merge_syms(s, a, b)
                            for s in batch["syms"].to_pylist()
                        ],
                        pa.list_(pa.string()),
                    ),
                    "n": batch["n"],
                }
            )

        cur = cur.map_batches(apply_merge, batch_format="pyarrow").materialize()
    return merges


def bpe_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a learned merge list to one text (driver-side helper; the
    distributed encode is a map_batches over this per doc)."""
    rank = {pair: i for i, pair in enumerate(merges)}
    out: list[str] = []
    for w in _WORD.findall((text or "").lower()):
        syms = list(w)
        while len(syms) > 1:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms = (
                syms[:best_i]
                + [syms[best_i] + syms[best_i + 1]]
                + syms[best_i + 2 :]
            )
        out.extend(syms)
    return out

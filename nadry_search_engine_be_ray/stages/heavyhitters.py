"""Frequency sketches + exact heavy hitters over n-grams.

Two operators in the Misra-Gries / CM-sketch family the 100 TB curation
stack needs (hot n-grams for boilerplate detection, stop-phrase mining,
contamination screens):

* ``CountMinSketch`` — the classic Cormode-Muthukrishnan (2005) mergeable
  frequency sketch: depth x width int64 counters, point estimate = min over
  rows.  Estimates NEVER undercount, which is what makes the exact two-pass
  plan below safe.
* ``SpaceSavingTopK`` — Metwally et al. (2005) capacity-m top-k counter
  with the standard merge (sum counters, truncate to m); any item with
  true count > n/m is guaranteed present.

``heavy_hitter_grams`` is the EXACT heavy-hitter plan built from the CM
sketch, shaped for scale:

  pass 1  map_batches -> one fixed-size sketch row per batch (kilobytes per
          block regardless of input size), summed at the root (associative;
          a 256-node run would tree-reduce the same rows).
  pass 2  the merged sketch is broadcast (``ray.put`` once); each batch
          counts its grams locally and emits partial counts ONLY for grams
          whose GLOBAL sketch estimate clears the threshold — a superset of
          the true heavy hitters (CM never undercounts), so the following
          ``groupby("gram").sum`` shuffles candidate grams only, not the
          full gram vocabulary.  A final filter drops the false positives.

The result is exactly ``SELECT gram, count(*) ... HAVING count >= T`` —
checked against that DuckDB oracle by the driver — while the all-to-all
exchange is proportional to |candidates| x blocks, not |vocabulary|.

Tokenization mirrors the SQL-expressible simple tokenizer used by the
``textqueries`` suite (``re.split('[^a-z0-9]+')``, len >= 2) so DuckDB can
recompute the grams verbatim.
"""

from __future__ import annotations

import re
import zlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .lm import ngram_strings

_SIMPLE = re.compile(r"[^a-z0-9]+")

CMS_DEPTH = 4
CMS_WIDTH = 1 << 13  # 8192 counters/row -> 256 KB sketch, ~0.03% of 1M adds
_MERSENNE = (1 << 61) - 1
# fixed odd constants -> deterministic 2-universal-style row hashes
_A = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
               0x165667B19E3779F9, 0x27D4EB2F165667C5], dtype=np.uint64)
_B = np.array([0x85EBCA6B, 0xFD7046C5, 0xB55A4F09, 0x8DA6B343], dtype=np.uint64)


def simple_grams(text: str, n: int = 2) -> list[str]:
    """Space-joined n-grams of the >=2-char simple tokens (SQL-mirrorable:
    list_filter + list_transform over string_split_regex)."""
    toks = [t for t in _SIMPLE.split((text or "").lower()) if len(t) >= 2]
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def batch_gram_counter(texts, n: int = 2) -> Counter:
    """Exact batch-level gram counts via Arrow kernels (regex split,
    same-doc n-gram join, group count) — gram stream identical to
    ``simple_grams`` per doc; Python cost is per DISTINCT gram (the
    vocab-sized sketch feed), never per token."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    split = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(texts, "")), pattern="[^a-z0-9]+"
    )
    lens = pc.list_value_length(split).to_numpy().astype(np.int64)
    flat = pc.list_flatten(split)
    doc_pos = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = pc.greater_equal(pc.utf8_length(flat), 2).to_numpy(
        zero_copy_only=False
    )
    grams, _ = ngram_strings(doc_pos[keep], flat.filter(pa.array(keep)), n)
    if len(grams) == 0:
        return Counter()
    g = pa.table({"g": grams}).group_by("g").aggregate([("g", "count")])
    return Counter(dict(zip(g["g"].to_pylist(), g["g_count"].to_pylist())))


def _gram_hashes(grams: list[str]) -> np.ndarray:
    """(depth, n) int64 column indexes for each gram (crc32 base hash,
    per-row affine rehash mod a Mersenne prime — deterministic across
    processes, no PYTHONHASHSEED dependence)."""
    base = np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.uint64)
    with np.errstate(over="ignore"):
        rows = (_A[:, None] * base[None, :] + _B[:, None]) % np.uint64(_MERSENNE)
    return (rows % np.uint64(CMS_WIDTH)).astype(np.int64)


class CountMinSketch:
    """Mergeable count-min sketch (never undercounts; merge = counter sum)."""

    def __init__(self, counts: np.ndarray | None = None):
        self.counts = (
            counts
            if counts is not None
            else np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
        )

    def add_counter(self, counter: Counter) -> None:
        if not counter:
            return
        grams = list(counter.keys())
        vals = np.fromiter(counter.values(), dtype=np.int64, count=len(grams))
        idx = _gram_hashes(grams)
        for d in range(CMS_DEPTH):
            np.add.at(self.counts[d], idx[d], vals)

    def estimate(self, grams: list[str]) -> np.ndarray:
        if not grams:
            return np.zeros(0, dtype=np.int64)
        idx = _gram_hashes(grams)
        return np.min(
            self.counts[np.arange(CMS_DEPTH)[:, None], idx], axis=0
        )

    def merge_bytes(self, raw: bytes) -> None:
        self.counts += np.frombuffer(raw, dtype=np.int64).reshape(
            CMS_DEPTH, CMS_WIDTH
        )

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()


class SpaceSavingTopK:
    """Metwally et al. space-saving counter: capacity-m dict; on overflow
    the minimum counter is evicted and inherited (over-estimate), so any
    item with true count > n/m survives.  Merge: sum, keep top m."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.counters: dict[str, int] = {}
        # eviction count: nonzero means estimates may over-count — the
        # exact regime (what the SQL oracle checks) requires 0 evictions
        # everywhere (ADVICE r3)
        self.evictions = 0

    def add(self, item: str, count: int = 1) -> None:
        c = self.counters
        if item in c:
            c[item] += count
        elif len(c) < self.capacity:
            c[item] = count
        else:
            victim = min(c, key=c.__getitem__)
            floor = c.pop(victim)
            c[item] = floor + count
            self.evictions += 1

    def merge(self, other: "SpaceSavingTopK") -> None:
        for k, v in other.counters.items():
            self.counters[k] = self.counters.get(k, 0) + v
        if len(self.counters) > self.capacity:
            keep = sorted(
                self.counters.items(), key=lambda kv: (-kv[1], kv[0])
            )[: self.capacity]
            self.counters = dict(keep)

    def top(self, k: int) -> list[tuple[str, int]]:
        return sorted(
            self.counters.items(), key=lambda kv: (-kv[1], kv[0])
        )[:k]


def build_gram_cms(ds: ray.data.Dataset, text_col: str = "text",
                   n: int = 2) -> CountMinSketch:
    """Pass 1: per-batch sketch rows (fixed 256 KB each), root sum.  The
    root merge is O(n_blocks) kilobyte rows — at cluster scale the same
    associative merge runs as a tree reduce."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        counter = batch_gram_counter(batch[text_col], n)
        cms = CountMinSketch()
        cms.add_counter(counter)
        return pa.table({"sketch": pa.array([cms.to_bytes()], pa.binary())})

    merged = CountMinSketch()
    for part in ds.map_batches(
        sketch_batch, batch_format="pyarrow"
    ).to_pandas()["sketch"]:
        merged.merge_bytes(part)
    return merged


def heavy_hitter_grams(sf_dir: str, threshold: int = 30,
                       n: int = 2) -> pd.DataFrame:
    """EXACT grams with corpus count >= threshold (two-pass CM plan above).

    Returns (gram, cnt) sorted by gram — identical to the DuckDB
    ``HAVING count(*) >= threshold`` oracle.
    """
    import ray
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    sketch_ref = ray.put(build_gram_cms(ds, "text", n).to_bytes())

    def candidate_partials(batch: pa.Table) -> pa.Table:
        cms = CountMinSketch(
            np.frombuffer(ray.get(sketch_ref), dtype=np.int64)
            .reshape(CMS_DEPTH, CMS_WIDTH)
            .copy()
        )
        counter = batch_gram_counter(batch["text"], n)
        grams = list(counter.keys())
        est = cms.estimate(grams)
        keep = [
            (g, counter[g]) for g, e in zip(grams, est) if e >= threshold
        ]
        return pa.table(
            {
                "gram": pa.array([g for g, _ in keep], pa.string()),
                "cnt": pa.array([c for _, c in keep], pa.int64()),
            }
        )

    out = (
        ds.map_batches(candidate_partials, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    out = out[out["cnt"] >= threshold].copy()
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values("gram").reset_index(drop=True)


def approx_top_grams(sf_dir: str, k: int = 25, capacity: int = 4096,
                     n: int = 2) -> pd.DataFrame:
    """Approximate top-k grams via mergeable space-saving counters (one
    capacity-bounded counter per batch, root merge).  With capacity >=
    distinct-gram count the result is EXACT — which the pytest guarantee
    test exploits; production would size capacity ~ k / epsilon."""

    def ss_batch(batch: pa.Table) -> pa.Table:
        ss = SpaceSavingTopK(capacity)
        counter = batch_gram_counter(batch["text"], n)
        for g, c in counter.items():
            ss.add(g, c)
        items = list(ss.counters.items())
        return pa.table(
            {
                "gram": pa.array([g for g, _ in items], pa.string()),
                "cnt": pa.array([c for _, c in items], pa.int64()),
                # per-batch eviction flag rides along so the root can tell
                # whether ANY batch left the exact regime (ADVICE r3)
                "evicted": pa.array(
                    [ss.evictions > 0] * len(items), pa.bool_()
                ),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    merged = SpaceSavingTopK(capacity)
    parts = ds.map_batches(ss_batch, batch_format="pyarrow").to_pandas()
    approximate = bool(parts["evicted"].any()) if len(parts) else False
    for g, c in zip(parts["gram"], parts["cnt"]):
        merged.counters[g] = merged.counters.get(g, 0) + int(c)
    if len(merged.counters) > merged.capacity:
        approximate = True
        merged.counters = dict(
            sorted(
                merged.counters.items(), key=lambda kv: (-kv[1], kv[0])
            )[: merged.capacity]
        )
    if approximate:
        # counts may over-estimate from here on; the exact-vs-SQL-oracle
        # guarantee no longer applies — size capacity above the distinct
        # gram count (e.g. from a distinct-count pre-pass) to restore it
        print(
            f"approx_top_grams: capacity {capacity} exceeded "
            "(space-saving evictions occurred) — result is approximate, "
            "not exact"
        )
    top = merged.top(k)
    return pd.DataFrame(
        {
            "gram": [g for g, _ in top],
            "cnt": pd.Series([c for _, c in top], dtype="int64"),
        }
    )

"""Mergeable sketch operators — the approximate/streaming analogs of the
exact distinct-count and quantile operators (the scale path when exact
grouped shuffles are too expensive; task brief: custom operators /
"a novel sketch").

Both sketches follow the same Ray shape: ``map_batches`` emits one
FIXED-SIZE sketch row per batch (vectorized numpy update), a tiny
all-to-all merges them associatively, and the estimate is computed from
the merged sketch — the shuffle moves kilobytes regardless of input size.

* HyperLogLog (Flajolet et al. 2007, standard bias correction): distinct
  doc_ids / terms with ~1.04/sqrt(m) relative error (m=4096 -> ~1.6%).
* Fixed-grid quantile histogram: values bucketed on a fixed range grid
  (the events.value domain); quantiles interpolate the merged CDF.  A
  production system would use t-digest/KLL; the grid keeps the math
  deterministic and dependency-free.

Hashes are deterministic (splitmix64 of the int64 key), so results are
stable across runs and partitionings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 12                 # 2^12 = 4096 registers, ~1.6% relative error
HLL_M = 1 << HLL_P


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def hll_item_ranks(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-item (register index, rank) pairs — the hash side of the sketch
    (split out so oracles can dump it and recompute the register max /
    estimator independently)."""
    h = _splitmix64(values.astype(np.int64).view(np.uint64))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = (leading zeros of rest) + 1, exact vectorized clz by bisection
    # (rest is never 0: the low P bits are forced on)
    lz = np.zeros(rest.size, dtype=np.uint8)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        hi_zero = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz[hi_zero] += shift
        with np.errstate(over="ignore"):
            cur[hi_zero] = cur[hi_zero] << np.uint64(shift)
    rank = (lz + 1).astype(np.uint8)
    return idx, rank


def hll_update(values: np.ndarray) -> np.ndarray:
    """One batch -> an m-register uint8 sketch (vectorized)."""
    idx, rank = hll_item_ranks(values)
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range correction."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, col: str) -> float:
    """Approximate COUNT(DISTINCT col) for an int64 column: per-batch
    sketches, one tiny merge (registers max), estimator at the root."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        regs = hll_update(v)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(sketch_batch, batch_format="pyarrow").to_pandas()
    merged = np.zeros(HLL_M, dtype=np.uint8)
    for b in parts["regs"]:
        np.maximum(merged, np.frombuffer(b, dtype=np.uint8), out=merged)
    return hll_estimate(merged)


Q_BINS = 2048


def quantile_sketch(ds, col: str, lo: float, hi: float,
                    qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> list[float]:
    """Approximate quantiles from a fixed-grid histogram sketch: per-batch
    vectorized bincount over Q_BINS buckets of [lo, hi], summed at the
    root, quantiles linearly interpolated inside the winning bucket.
    Max error = one bucket width ((hi-lo)/Q_BINS)."""

    def hist_batch(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(((v - lo) / (hi - lo) * Q_BINS).astype(np.int64), 0, Q_BINS - 1)
        counts = np.bincount(b, minlength=Q_BINS)
        return pa.table({"h": pa.array([counts.astype(np.int64).tobytes()], pa.binary())})

    parts = ds.map_batches(hist_batch, batch_format="pyarrow").to_pandas()
    hist = np.zeros(Q_BINS, dtype=np.int64)
    for b in parts["h"]:
        hist += np.frombuffer(b, dtype=np.int64)
    total = int(hist.sum())
    cdf = np.cumsum(hist)
    out = []
    width = (hi - lo) / Q_BINS
    for q in qs:
        target = q * total
        i = int(np.searchsorted(cdf, target, side="left"))
        prev = cdf[i - 1] if i else 0
        frac = (target - prev) / max(1, hist[i]) if hist[i] else 0.0
        out.append(lo + (i + frac) * width)
    return out

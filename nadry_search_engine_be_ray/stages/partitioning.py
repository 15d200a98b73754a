"""Sizing for coarse partition-fused exchanges.

Several stages fuse fine-grained keys (grams, shas, pair ids, users, ppl
values) into coarse hash partitions and run ONE vectorized call per
partition (``groupby("part").map_groups``).  A fixed count caps shuffle
parallelism and makes per-task memory grow with the input (ADVICE r3,
medium) — so the count is derived from the input footprint instead:
~``target_bytes`` of source parquet per fused partition, clamped to
[``lo``, ``hi``].  On test-scale inputs this resolves to the historical 64
(outputs are partition-count independent; only task granularity changes);
at 100 TB it grows to ~1.6 M parts, keeping one task's slice bounded.
"""

from __future__ import annotations

import os

# 64 MB of (compressed) parquet per fused partition ≈ a few hundred MB of
# in-memory Arrow per group task — comfortably inside a worker heap.
TARGET_BYTES_PER_PART = 64 << 20
DEFAULT_PARTS = 64
MAX_PARTS = 1 << 20


def fused_parts(
    ds=None,
    *,
    bytes_hint: int | None = None,
    target_bytes: int = TARGET_BYTES_PER_PART,
    lo: int = DEFAULT_PARTS,
    hi: int = MAX_PARTS,
) -> int:
    """Coarse fused-partition count for ``ds`` (or an explicit
    ``bytes_hint``).  Uses ``ds.input_files()`` — free plan metadata; it
    returns ``[]`` on derived datasets, in which case the historical
    default ``lo`` applies (callers with better knowledge pass
    ``bytes_hint`` or their own count).  Never calls ``size_bytes()`` on a
    possibly-transformed dataset (that triggers execution)."""
    if bytes_hint is None and ds is not None:
        try:
            files = ds.input_files()
            bytes_hint = sum(
                os.path.getsize(f) for f in files if os.path.isfile(f)
            )
        except Exception:
            bytes_hint = None
    if not bytes_hint:
        return lo
    return int(max(lo, min(hi, bytes_hint // target_bytes + lo)))

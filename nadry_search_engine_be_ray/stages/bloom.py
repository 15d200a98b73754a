"""Bloom-filter build + membership prefilter over integer key columns.

The broadcast-sorted-key semi joins in this repo (corpus membership in
``pipelines/pagerank.py``, anti/semi joins in ``pipelines/relational.py``)
document "at 10^12-doc scale this becomes a Bloom filter" — this is that
stage.  A Bloom bitmap of ``m`` bits with ``k`` hashes costs m/8 bytes to
broadcast regardless of key count (vs 8 bytes/key for the exact array),
admits false POSITIVES only, and therefore composes as
``bloom prefilter -> exact verify on the survivors`` with exact output.

Hashes are affine-modular over the Mersenne prime 2^31 - 1 with closed-
form constants — deliberately SQL-expressible, so the DuckDB oracle
recomputes the bitmap, the candidate set, and the false-positive count
bit-exactly (no dumped state):

    key_m  = key mod P                      (P = 2^31 - 1)
    a_i    = (1103515245 * (i + 1) + 12345) mod P
    b_i    = ((i + 1) * 2654435761)         mod P
    bit_i  = ((a_i * key_m + b_i) mod P) mod m

All 64-bit-safe: a_i, key_m < 2^31 so a_i * key_m < 2^62.

Scale shape: per-block partial bitmaps are OR-combined; the driver holds
only the m-bit array (the broadcast artifact itself).  For bitmaps too
large for one combine (multi-GB m), OR them in a tree of ``@ray.remote``
tasks — the partial per block is already the full-m bitmap, so the
combine depth is log(n_blocks) with m-sized exchanges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MERSENNE_31 = (1 << 31) - 1


def _bloom_bit_indexes(keys: np.ndarray, k: int, m: int) -> np.ndarray:
    """(k, n) bit indexes for int64 keys — vectorized, 64-bit-safe."""
    p = np.int64(MERSENNE_31)
    key_m = np.abs(keys.astype(np.int64)) % p
    i = np.arange(1, k + 1, dtype=np.int64)[:, None]
    a = (1103515245 * i + 12345) % p
    b = (i * 2654435761) % p
    return ((a * key_m[None, :] + b) % p) % np.int64(m)


def bloom_build(ds, key_col: str, m: int = 1 << 17, k: int = 3) -> np.ndarray:
    """Build the m-bit membership bitmap (bool array) over ``ds[key_col]``.
    Per-batch partials are bit-index lists (deduped), OR-combined on the
    driver; the result is the broadcast artifact (m bits ≈ m/8 bytes via
    ``np.packbits`` if shipped packed)."""

    def batch_bits(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if keys.size == 0:
            return pa.table({"bit": pa.array([], pa.int64())})
        bits = np.unique(_bloom_bit_indexes(keys, k, m))
        return pa.table({"bit": pa.array(bits, pa.int64())})

    bitmap = np.zeros(m, dtype=bool)
    for b in ds.map_batches(batch_bits, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        bitmap[b["bit"].to_numpy(zero_copy_only=False)] = True
    return bitmap


def bloom_contains(keys: np.ndarray, bitmap: np.ndarray, k: int) -> np.ndarray:
    """Vectorized membership test: True iff ALL k hash bits are set."""
    if keys.size == 0:
        return np.zeros(0, dtype=bool)
    idx = _bloom_bit_indexes(keys, k, len(bitmap))
    return bitmap[idx].all(axis=0)


def bloom_filter_ds(ds, key_col: str, bitmap_ref, k: int):
    """Prefilter ``ds`` to rows whose key MAY be in the build set (the
    broadcast-bitmap map_batches stage; false positives possible, false
    negatives impossible)."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        bm = (
            ray.get(bitmap_ref)
            if isinstance(bitmap_ref, ray.ObjectRef)
            else bitmap_ref
        )
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(bloom_contains(keys, bm, k)))

    return ds.map_batches(fn, batch_format="pyarrow")


def bloom_semi_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    m: int = 1 << 17,
    k: int = 3,
):
    """EXACT semi join via the scale shape: Bloom prefilter (m-bit
    broadcast) drops most non-members cheaply, then an exact verify
    against the right key set removes the false positives.  Returns
    ``(joined_ds, stats_dict)``; stats count the prefilter's work so the
    FP behavior is observable (and SQL-recomputable).

    The verify here broadcasts the sorted distinct right keys (fine below
    ~100M keys); above that, hash-partition the SURVIVORS against the
    right keys — the Bloom stage has already shrunk the left side, which
    is the entire point at 10^12 rows."""
    import ray

    bitmap = bloom_build(right_ds, right_key, m, k)
    bitmap_ref = ray.put(bitmap)
    candidates = bloom_filter_ds(left_ds, left_key, bitmap_ref, k)

    rk_pd = right_ds.select_columns([right_key]).to_pandas()
    # empty-Dataset to_pandas drops column metadata (same quirk handled in
    # the embedding dedup queries)
    rkeys = (
        np.unique(rk_pd[right_key].to_numpy(np.int64))
        if len(rk_pd)
        else np.array([], dtype=np.int64)
    )
    rkeys_ref = ray.put(rkeys)

    def verify(batch: pa.Table) -> pa.Table:
        ks = ray.get(rkeys_ref)
        keys = batch[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        if ks.size == 0:
            return batch.slice(0, 0)
        idx = np.searchsorted(ks, keys)
        idx[idx == ks.size] = 0
        return batch.filter(pa.array(ks[idx] == keys))

    joined = candidates.map_batches(verify, batch_format="pyarrow")
    stats = {
        "m": m,
        "k": k,
        "n_set_bits": int(bitmap.sum()),
        "n_right_keys": int(rkeys.size),
    }
    return joined, stats

"""Deterministic sampling / splitting / sharding for training-data curation.

The reference has NO sampling operators anywhere (SURVEY.md §2.6 "No
sampling"); a 100 TB training-data pipeline needs them constantly: held-out
splits, per-language subsampling, per-domain caps (C4 / RefinedWeb-style
source balancing), quota-driven mixture construction, and a seeded global
shuffle into training shards.  All five ops here key off ONE primitive — a
salted sha256 bucket of the row id — so every decision is (a) deterministic,
(b) reproducible across re-partitioning and re-runs (no RNG state, no
row-order dependence), and (c) exactly reproducible by a DuckDB SQL oracle
(`sha256()` hex-prefix → int, the driver's correctness gate).

Scale notes (100 TB):

* ``assign_splits`` / ``stratified_sample`` are embarrassingly parallel
  ``map_batches`` — no shuffle at any scale.  The per-row sha256 IS the
  workload (C-speed hashlib calls; a salted stable hash is the point — a
  numpy RNG would not survive re-partitioning).
* ``cap_per_key`` (domain caps, quota sampling) does a per-batch PARTIAL
  top-cap before the ``groupby(key)`` finalize, so the shuffle carries at
  most ``cap × n_blocks`` rows per key instead of the whole corpus — hot
  domains (the reason caps exist) never concentrate their full row set in
  one task.
* ``shuffle_shards`` shuffles once by shard id; within-shard order comes
  from the hash, so shard files are reproducible and a failed export can
  re-run single shards.  Size ``n_shards`` so one shard ≈ one output file
  (thousands at 100 TB, keeping groups task-sized).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_BUCKET_SPACE = 1 << 32


def sha_bucket(ids, salt: str) -> np.ndarray:
    """uint32-range bucket per id: first 8 hex chars of
    sha256("{salt}:{id}") as an int (matches the SQL oracle's
    ``cast('0x' || substr(sha256(...), 1, 8) as bigint)``)."""
    return np.array(
        [
            int(
                hashlib.sha256(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            for i in ids
        ],
        dtype=np.int64,
    )


def split_thresholds(ratios: list[tuple[str, float]]) -> list[tuple[str, int]]:
    """Cumulative integer bucket thresholds for ``assign_splits``: a row
    lands in the first split whose threshold exceeds its bucket."""
    total = sum(r for _, r in ratios)
    if not (abs(total - 1.0) < 1e-9):
        raise ValueError(f"split ratios must sum to 1, got {total}")
    acc, out = 0.0, []
    for name, r in ratios:
        acc += r
        out.append((name, min(int(round(acc * _BUCKET_SPACE)), _BUCKET_SPACE)))
    return out


class AssignSplitsBatch:
    """map_batches stage: add (bucket, split) from the salted id hash."""

    def __init__(self, ratios: list[tuple[str, float]], salt: str,
                 id_col: str = "doc_id"):
        self.bounds = split_thresholds(ratios)
        self.salt = salt
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = sha_bucket(batch[self.id_col].to_pylist(), self.salt)
        # first threshold > bucket wins; searchsorted over the sorted
        # cumulative bounds gives the split index vectorized
        edges = np.array([t for _, t in self.bounds], dtype=np.int64)
        idx = np.searchsorted(edges, b, side="right")
        names = np.array([n for n, _ in self.bounds], dtype=object)
        return (
            batch.append_column("bucket", pa.array(b, pa.int64()))
            .append_column("split", pa.array(names[idx], pa.string()))
        )


def assign_splits(ds, ratios: list[tuple[str, float]] | None = None,
                  salt: str = "split-v1", id_col: str = "doc_id"):
    """Deterministic train/val/test assignment: adds ``bucket`` (the salted
    sha256 prefix of the id) and ``split`` columns.  Shuffle-free."""
    ratios = ratios or [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    return ds.map_batches(
        AssignSplitsBatch(ratios, salt, id_col), batch_format="pyarrow"
    )


class StratifiedSampleBatch:
    """map_batches filter: keep a row iff its salted bucket falls below the
    per-stratum fraction threshold (missing stratum → ``default_frac``)."""

    def __init__(self, key: str, fractions: dict[str, float],
                 default_frac: float = 0.0, salt: str = "sample-v1",
                 id_col: str = "doc_id"):
        self.key = key
        self.thresholds = {
            k: int(round(f * _BUCKET_SPACE)) for k, f in fractions.items()
        }
        self.default_t = int(round(default_frac * _BUCKET_SPACE))
        self.salt = salt
        self.id_col = id_col
        # vectorized per-row threshold lookup (index_in probe)
        self.t_keys = pa.array(sorted(self.thresholds), pa.string())
        self.t_vals = np.array(
            [self.thresholds[k] for k in sorted(self.thresholds)],
            dtype=np.int64,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = sha_bucket(batch[self.id_col].to_pylist(), self.salt)
        if len(self.t_keys):
            idx = pc.fill_null(
                pc.index_in(batch[self.key], value_set=self.t_keys), -1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            thr = np.where(
                idx >= 0, self.t_vals[np.maximum(idx, 0)], self.default_t
            )
        else:
            thr = np.full(len(batch), self.default_t, dtype=np.int64)
        keep = b < thr
        return batch.append_column(
            "bucket", pa.array(b, pa.int64())
        ).filter(pa.array(keep))


def stratified_sample(ds, key: str, fractions: dict[str, float],
                      default_frac: float = 0.0, salt: str = "sample-v1",
                      id_col: str = "doc_id"):
    """Per-stratum deterministic subsampling (e.g. keep 20 % of English,
    100 % of low-resource languages).  Shuffle-free; returns the surviving
    rows plus their ``bucket``."""
    return ds.map_batches(
        StratifiedSampleBatch(key, fractions, default_frac, salt, id_col),
        batch_format="pyarrow",
    )


def _head_per_key(tbl: pa.Table, key: str, cap_of, order_cols: list[str],
                  default_cap: int) -> pa.Table:
    """Keep the first ``cap(key)`` rows per key under ``order_cols`` order —
    vectorized: sort, then rank-within-key via run-length arithmetic."""
    t = tbl.sort_by([(key, "ascending")] + [(c, "ascending") for c in order_cols])
    keys = t[key].to_numpy(zero_copy_only=False)
    n = len(keys)
    if n == 0:
        return t
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = keys[1:] != keys[:-1]
    run_id = np.cumsum(new_run) - 1
    run_start = np.flatnonzero(new_run)
    rank = np.arange(n) - run_start[run_id]
    if isinstance(cap_of, dict):
        caps = np.array(
            [cap_of.get(k, default_cap) for k in keys[run_start]],
            dtype=np.int64,
        )
    else:
        caps = np.full(len(run_start), int(cap_of), dtype=np.int64)
    return t.filter(pa.array(rank < caps[run_id]))


def cap_per_key(ds, key: str, cap, order_cols: list[str] | None = None,
                default_cap: int = 0, num_partitions: int | None = None):
    """Keep at most ``cap`` rows per ``key`` value, chosen as the first rows
    under ``order_cols`` ascending (deterministic).  ``cap`` may be an int
    (uniform cap) or a dict key→quota (mixture construction; keys absent
    from the dict get ``default_cap``).

    Shape: per-batch PARTIAL head-per-key (bounds the shuffle at
    cap × n_blocks rows per key) → ``groupby(key).map_groups`` finalize.
    """
    order_cols = order_cols or ["doc_id"]

    def partial(batch: pa.Table) -> pa.Table:
        return _head_per_key(batch, key, cap, order_cols, default_cap)

    def finalize(group: pa.Table) -> pa.Table:
        return _head_per_key(group, key, cap, order_cols, default_cap)

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    grouped = pruned.groupby(key)
    return grouped.map_groups(finalize, batch_format="pyarrow")


def quota_sample(ds, key: str, quotas: dict[str, int],
                 default_quota: int = 0, salt: str = "quota-v1",
                 id_col: str = "doc_id"):
    """Mixture construction: take up to ``quotas[key]`` rows per key value,
    chosen in salted-hash order (a deterministic uniform draw, not
    first-N-by-id).  Rows from keys absent in ``quotas`` get
    ``default_quota``.  Adds ``bucket``."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = sha_bucket(batch[id_col].to_pylist(), salt)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    withb = ds.map_batches(add_bucket, batch_format="pyarrow")
    return cap_per_key(
        withb, key, quotas, order_cols=["bucket", id_col],
        default_cap=default_quota,
    )


def shuffle_shards(ds, n_shards: int = 16, salt: str = "shuffle-v1",
                   id_col: str = "doc_id", keep_cols: list[str] | None = None):
    """Seeded global shuffle into training shards: shard = bucket mod
    ``n_shards``; within-shard position = rank under (bucket, id).  The
    result is a reproducible random permutation — same salt → same shards
    and order, regardless of input partitioning.  Returns
    (id, shard, pos, *keep_cols)."""
    keep_cols = keep_cols or []

    def add_shard(batch: pa.Table) -> pa.Table:
        b = sha_bucket(batch[id_col].to_pylist(), salt)
        t = pa.table(
            {
                id_col: batch[id_col],
                **{c: batch[c] for c in keep_cols},
            }
        )
        return t.append_column(
            "bucket", pa.array(b, pa.int64())
        ).append_column(
            "shard", pa.array(b % n_shards, pa.int64())
        )

    def order_shard(group: pa.Table) -> pa.Table:
        g = group.sort_by([("bucket", "ascending"), (id_col, "ascending")])
        return g.append_column(
            "pos", pa.array(np.arange(len(g), dtype=np.int64), pa.int64())
        )

    withs = ds.map_batches(add_shard, batch_format="pyarrow")
    return withs.groupby("shard").map_groups(
        order_shard, batch_format="pyarrow"
    )


def temperature_mix(ds, total: int, *, key: str = "lang",
                    alpha: float = 0.5, salt: str = "mix-v1",
                    id_col: str = "doc_id"):
    """Temperature-scaled source mixing (the multilingual-LM data-mixing
    op — Conneau & Lample 2019 §3.1): per-key target counts proportional
    to n_key^alpha, so low-resource keys are up-sampled RELATIVE to
    proportional sampling; rows are then drawn per key in salted-hash
    order (quota_sample's deterministic uniform draw).

    Only ``alpha=0.5`` is exposed: sqrt is correctly rounded in IEEE-754,
    so the engine (numpy) and the SQL oracle (DuckDB) compute the SAME
    double for every share — a general ``pow()`` has no such cross-engine
    guarantee.  Targets use floor(total * sqrt(n_k) / Σ sqrt(n_j)), also
    exactly reproducible.

    Shape: one tiny groupby-count (``#keys`` rows to the driver — the
    mixing TABLE is driver-state by design, like the thesaurus), then the
    shuffle-free cap_per_key partial-head selection.  Returns the selected
    rows with ``bucket`` attached.
    """
    assert alpha == 0.5, "only sqrt-temperature exposed (see docstring)"
    counts = ds.groupby(key).count().to_pandas()
    cnt_col = [c for c in counts.columns if c != key][0]
    w = np.sqrt(counts[cnt_col].to_numpy(dtype=np.float64))
    tgt = np.floor(total * w / w.sum()).astype(np.int64)
    quotas = {k: int(t) for k, t in zip(counts[key], tgt)}

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = sha_bucket(batch[id_col].to_pylist(), salt)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    withb = ds.map_batches(add_bucket, batch_format="pyarrow")
    return cap_per_key(
        withb, key, quotas, order_cols=["bucket", id_col], default_cap=0
    )

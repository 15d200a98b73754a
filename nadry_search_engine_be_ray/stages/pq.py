"""Product quantization ANN (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search") — the memory-bound scale path for embedding
search: each unit-normalized vector compresses to ``m`` one-byte codes
(here m=8 over dim 64), so a 100 TB float corpus becomes a ~1.5 % codes
table that fits the object store, and queries scan codes with
asymmetric-distance (ADC) table lookups instead of float matmuls.

Distributed shape mirrors ``stages/clustering.py``'s Lloyd loop:

* ``pq_train`` — per-subspace k-means over the subvectors, ALL ``m``
  subspaces advanced in the SAME shuffle-free pass per iteration (one thin
  partial row per (subspace, cluster) per block; driver combines
  <= m x k x n_blocks rows; codebook broadcast per iteration).
* ``pq_encode`` — shuffle-free nearest-centroid coding against the
  broadcast codebook; emits (vec_id, code list).
* ``pq_adc_topk`` — per-query ADC distance tables (m x k) built once on
  the driver, broadcast with the codebook; per-block vectorized
  table-lookup scoring + partial top-k, then one driver merge of
  <= n_blocks x k thin rows.

Distances are SQUARED L2 between unit vectors (monotone-equivalent to
cosine: ||a-b||^2 = 2 - 2cos).  ADC values are computed as
``sqrt(sum((a-b)^2))^2`` to bit-match the DuckDB oracle's
``pow(list_distance(a, b), 2)``; ranking uses the ROUNDED distance with a
vec_id tiebreak so both sides break float near-ties identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .clustering import _min_k_rows, _vec_table
from .lm import default_pool_size
from .similarity import _batch_matrix, _normalize


def _sub_view(mat: np.ndarray, m: int) -> np.ndarray:
    """(n, dim) -> (n, m, dsub); dim must divide evenly."""
    n, dim = mat.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    return mat.reshape(n, m, dim // m)


def pq_train(ds, m: int = 8, k: int = 16, n_iters: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """Train the (m, k, dsub) codebook over unit-normalized vectors.
    Returns ``(codebooks, normalized_ds)``.  Deterministic: init = the k
    smallest-id vectors' subvectors; empty clusters keep their previous
    centroid; centroids are subvector MEANS (not re-normalized)."""
    import ray

    def normalize_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(_batch_matrix(batch, vec_col))
        return _vec_table(ids, mat, id_col, vec_col)

    normed = ds.map_batches(
        normalize_batch, batch_format="pyarrow"
    ).materialize()

    heads = normed.map_batches(
        lambda b: _min_k_rows(b, id_col, k), batch_format="pyarrow"
    ).to_pandas()
    heads = heads.sort_values(id_col).head(k)
    init = np.array(heads[vec_col].to_list(), dtype=np.float64)
    cb = np.ascontiguousarray(
        _sub_view(init, m).transpose(1, 0, 2)
    )  # (m, k, dsub)

    # pinned-shard worker pool (the lr_fit / kmeans_fit shape): workers
    # decode their subvector views once; an iteration exchanges only the
    # (m, k, dsub) codebook out and ≤ m × k thin partials per block back
    from .blocks import nonempty_refs
    block_refs = nonempty_refs(normed, [vec_col])
    n_workers = max(
        1,
        min(len(block_refs), int(ray.cluster_resources().get("CPU", 8))),
    )

    @ray.remote
    class _PqWorker:
        def __init__(self, refs: list):
            self.subs = [
                _sub_view(_batch_matrix(tbl, vec_col), m)
                for tbl in ray.get(refs)
            ]

        def partials(self, c) -> list:
            out = []
            for sub in self.subs:
                rows_out = []
                for j in range(m):
                    d2 = (
                        (sub[:, j, None, :] - c[j][None, :, :]) ** 2
                    ).sum(axis=2)
                    a = np.argmin(d2, axis=1)
                    for cl in np.unique(a):
                        rows = sub[a == cl, j, :]
                        rows_out.append(
                            (j, int(cl), rows.shape[0], rows.sum(axis=0))
                        )
                out.append(rows_out)
            return out

    workers = [
        _PqWorker.remote(block_refs[i::n_workers])
        for i in range(n_workers)
    ]
    n_blocks = len(block_refs)

    for _ in range(n_iters):
        chunks = ray.get(
            [wk.partials.remote(cb) for wk in workers]
        )  # <= m x k x n_blocks thin rows — bounded combine
        # reassemble per-block partials in ORIGINAL block order so the
        # float combine matches the previous map_batches layout exactly
        by_block: list = [None] * n_blocks
        for wi, chunk in enumerate(chunks):
            for li, p in enumerate(chunk):
                by_block[wi + li * n_workers] = p
        sums_acc: dict[tuple, list] = {}
        counts_acc: dict[tuple, int] = {}
        for rows_out in by_block:
            for j, cl, nn, vs in rows_out:
                key = (j, cl)
                sums_acc.setdefault(key, []).append(vs)
                counts_acc[key] = counts_acc.get(key, 0) + nn
        nxt = cb.copy()
        for (j, cl), vlist in sums_acc.items():
            arr = np.stack(vlist)
            # bytewise sort -> the float sum is independent of block
            # layout / worker sharding (materialization under load can
            # produce different block boundaries between runs)
            arr = arr[np.lexsort(arr.T[::-1])]
            total = np.sum(arr, axis=0)
            nxt[j, cl] = total / max(counts_acc[(j, cl)], 1)
        cb = nxt
    return cb, normed


class PqEncodeBatch:
    """Shuffle-free per-subspace nearest-centroid coding (broadcast
    codebook; argmin ties go to the lowest cluster id, matching the
    oracle's (distance, cluster) ordering)."""

    def __init__(self, cb_ref, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 extra_cols: tuple = ()):
        import ray

        self.cb = (
            ray.get(cb_ref) if isinstance(cb_ref, ray.ObjectRef) else cb_ref
        )
        self.id_col, self.vec_col = id_col, vec_col
        self.extra_cols = tuple(extra_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.cb.shape[0]
        sub = _sub_view(_batch_matrix(batch, self.vec_col), m)
        codes = np.empty((sub.shape[0], m), dtype=np.int64)
        for j in range(m):
            d2 = ((sub[:, j, None, :] - self.cb[j][None, :, :]) ** 2).sum(
                axis=2
            )
            codes[:, j] = np.argmin(d2, axis=1)
        cols = {
            self.id_col: batch[self.id_col],
            "code": pa.array(
                [list(row) for row in codes], pa.list_(pa.int64())
            ),
        }
        for c in self.extra_cols:
            cols[c] = batch[c]
        return pa.table(cols)


def pq_encode(ds_normed, codebooks: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding", concurrency: int | None = None,
              extra_cols: tuple = ()):
    import ray

    cb_ref = ray.put(codebooks)
    return ds_normed.map_batches(
        PqEncodeBatch,
        fn_constructor_args=(cb_ref, id_col, vec_col, extra_cols),
        batch_format="pyarrow",
        concurrency=concurrency or default_pool_size(),
    )


def pq_adc_topk(ds_normed_codes, query_vectors: np.ndarray,
                codebooks: np.ndarray, qv_ids: np.ndarray,
                k: int = 10) -> pa.Table:
    """ADC top-k over an encoded Dataset (vec_id, code).  ``query_vectors``
    are raw (normalized here); returns (query_id, rank, vec_id, adc_dist)
    ranked by (rounded dist ASC, vec_id)."""
    import ray

    m = codebooks.shape[0]
    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    qsub = _sub_view(q, m)  # (nq, m, dsub)
    # sqrt-then-square bit-matches the oracle's pow(list_distance, 2)
    tables = (
        np.sqrt(((qsub[:, :, None, :] - codebooks[None, :, :, :]) ** 2)
                .sum(axis=3))
        ** 2
    )  # (nq, m, k)
    bc_ref = ray.put((tables, np.asarray(qv_ids, dtype=np.int64)))
    sub_idx = np.arange(m)

    def partial_topk(batch: pa.Table) -> pa.Table:
        tabs, qids = ray.get(bc_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        codes = _batch_matrix(batch, "code", dtype=np.int64)
        out = []
        for qi in range(tabs.shape[0]):
            dist = tabs[qi][sub_idx[None, :], codes].sum(axis=1)
            dr = np.round(dist, 6)
            order = np.lexsort((ids, dr))[: min(k, len(ids))]
            out.append(
                pa.table(
                    {
                        "query_id": pa.array(
                            np.full(order.size, qids[qi]), pa.int64()
                        ),
                        "vec_id": pa.array(ids[order], pa.int64()),
                        "adc_dist": pa.array(dr[order], pa.float64()),
                    }
                )
            )
        return pa.concat_tables(out)

    parts = ds_normed_codes.map_batches(partial_topk, batch_format="pyarrow")
    merged = pa.concat_tables(
        [pa.table(b) for b in parts.iter_batches(batch_format="pyarrow")]
        or [pa.table({"query_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "adc_dist": pa.array([], pa.float64())})]
    ).to_pandas()
    rows = []
    for qid, grp in merged.groupby("query_id", sort=True):
        vid = grp["vec_id"].to_numpy()
        d = grp["adc_dist"].to_numpy()
        order = np.lexsort((vid, d))[: min(k, len(vid))]
        rows.append(
            pa.table(
                {
                    "query_id": pa.array(
                        np.full(order.size, qid, dtype=np.int64), pa.int64()
                    ),
                    "rank": pa.array(
                        np.arange(order.size, dtype=np.int64), pa.int64()
                    ),
                    "vec_id": pa.array(vid[order], pa.int64()),
                    "adc_dist": pa.array(d[order], pa.float64()),
                }
            )
        )
    if not rows:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "adc_dist": pa.array([], pa.float64())})
    return pa.concat_tables(rows)


def ivfpq_adc_topk(ds_codes_lists, query_vectors: np.ndarray,
                   codebooks: np.ndarray, qv_ids: np.ndarray,
                   probe_of_query: list, k: int = 10) -> pa.Table:
    """IVF-PQ search (Jégou et al. 2011 IVFADC, non-residual variant —
    FAISS by_residual=False): each query scans ONLY the rows whose
    ``ivf_list`` is in its probed coarse lists, scoring by the same ADC
    table lookups as :func:`pq_adc_topk`.  The coarse prune multiplies the
    PQ compression: per query, candidates shrink from n to
    ~n·(n_probes/n_lists) BEFORE any distance math, and at scale the
    list id doubles as a partition column so probes prune at the read.

    ``probe_of_query[i]`` is the iterable of probed list ids for
    ``qv_ids[i]``.  Output schema and (rounded-dist, vec_id) ranking are
    identical to pq_adc_topk."""
    import ray

    m = codebooks.shape[0]
    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    qsub = _sub_view(q, m)
    tables = (
        np.sqrt(((qsub[:, :, None, :] - codebooks[None, :, :, :]) ** 2)
                .sum(axis=3))
        ** 2
    )
    probes = [np.array(sorted(pset), dtype=np.int64)
              for pset in probe_of_query]
    bc_ref = ray.put((tables, np.asarray(qv_ids, dtype=np.int64), probes))
    sub_idx = np.arange(m)

    def partial_topk(batch: pa.Table) -> pa.Table:
        tabs, qids, prb = ray.get(bc_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        lists = batch["ivf_list"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        codes = _batch_matrix(batch, "code", dtype=np.int64)
        out = []
        for qi in range(tabs.shape[0]):
            hit = np.isin(lists, prb[qi])
            if not hit.any():
                continue
            c_ids, c_codes = ids[hit], codes[hit]
            dist = tabs[qi][sub_idx[None, :], c_codes].sum(axis=1)
            dr = np.round(dist, 6)
            order = np.lexsort((c_ids, dr))[: min(k, c_ids.size)]
            out.append(
                pa.table(
                    {
                        "query_id": pa.array(
                            np.full(order.size, qids[qi]), pa.int64()
                        ),
                        "vec_id": pa.array(c_ids[order], pa.int64()),
                        "adc_dist": pa.array(dr[order], pa.float64()),
                    }
                )
            )
        if not out:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "adc_dist": pa.array([], pa.float64())})
        return pa.concat_tables(out)

    parts = ds_codes_lists.map_batches(partial_topk, batch_format="pyarrow")
    merged = pa.concat_tables(
        [pa.table(b) for b in parts.iter_batches(batch_format="pyarrow")]
        or [pa.table({"query_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "adc_dist": pa.array([], pa.float64())})]
    ).to_pandas()
    rows = []
    for qid, grp in merged.groupby("query_id", sort=True):
        vid = grp["vec_id"].to_numpy()
        d = grp["adc_dist"].to_numpy()
        order = np.lexsort((vid, d))[: min(k, len(vid))]
        rows.append(
            pa.table(
                {
                    "query_id": pa.array(
                        np.full(order.size, qid, dtype=np.int64), pa.int64()
                    ),
                    "rank": pa.array(
                        np.arange(order.size, dtype=np.int64), pa.int64()
                    ),
                    "vec_id": pa.array(vid[order], pa.int64()),
                    "adc_dist": pa.array(d[order], pa.float64()),
                }
            )
        )
    if not rows:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "adc_dist": pa.array([], pa.float64())})
    return pa.concat_tables(rows)

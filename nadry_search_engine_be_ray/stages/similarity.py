"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — a broadcast query matrix (``ray.put``
once), per-batch numpy matmul emitting per-batch partial top-k, then a tiny
``groupby(query_id)`` merge.  Scale path: LSH (random-hyperplane) bucketing —
probes only matching buckets, same verify math.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(ds, query_vectors: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Exact cosine top-k for each query vector.  Returns
    (query_id, rank, vec_id, cosine) with deterministic (-cosine, vec_id)
    ordering."""
    import ray

    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    qref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()]
        )
        m = _normalize(m)
        sims = qm @ m.T  # (n_queries, batch)
        out_q, out_id, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            for c in idx:
                out_q.append(qi)
                out_id.append(int(ids[c]))
                out_s.append(float(sims[qi, c]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        qid = int(group["query_id"][0].as_py())
        vid = group["vec_id"].to_numpy(zero_copy_only=False)
        sim = group["cosine"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, -sim))[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), pa.int64()),
                "rank": pa.array(np.arange(len(order)), pa.int32()),
                "vec_id": pa.array(vid[order], pa.int64()),
                "cosine": pa.array(sim[order], pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    merged = partials.groupby("query_id").map_groups(
        merge_topk, batch_format="pyarrow"
    )
    out = merged.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


class LshIndexBatch:
    """map_batches stage: assign each vector a random-hyperplane bucket."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 11,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch[self.vec_col].to_pylist()]
        )
        signs = (m @ self.planes.T) > 0
        buckets = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)
        return batch.append_column("bucket", pa.array(buckets, pa.int64()))


def lsh_topk(ds, query_vectors: np.ndarray, k: int = 10, n_planes: int = 6,
             seed: int = 11, id_col: str = "vec_id",
             vec_col: str = "embedding", n_probes: int = 4) -> pa.Table:
    """Approximate cosine top-k: search only vectors whose LSH bucket is
    within the ``n_probes`` nearest buckets (by hamming distance on the sign
    pattern) of the query's bucket.  Same output schema as brute force."""
    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    dim = q.shape[1]
    stage = LshIndexBatch(dim, n_planes, seed, vec_col)
    bucketed = ds.map_batches(stage, batch_format="pyarrow")

    q_signs = (q @ stage.planes.T) > 0
    q_buckets = (q_signs * (1 << np.arange(n_planes))).sum(axis=1)
    # probe set: all buckets within hamming distance allowing ~n_probes flips
    all_buckets = np.arange(1 << n_planes)
    probe_sets = []
    for qb in q_buckets:
        ham = np.array([bin(int(qb) ^ int(b)).count("1") for b in all_buckets])
        order = np.argsort(ham, kind="stable")
        probe_sets.append(set(all_buckets[order[: n_probes]].tolist()))

    tbl = bucketed.select_columns([id_col, vec_col, "bucket"]).to_pandas()
    ids = tbl[id_col].to_numpy()
    buckets = tbl["bucket"].to_numpy()
    mat = _normalize(np.stack(tbl[vec_col].to_numpy()).astype(np.float64))

    out_q, out_r, out_id, out_s = [], [], [], []
    for qi in range(q.shape[0]):
        mask = np.isin(buckets, list(probe_sets[qi]))
        if not mask.any():
            continue
        sims = q[qi] @ mat[mask].T
        sub_ids = ids[mask]
        order = np.lexsort((sub_ids, -sims))[:k]
        for rank, c in enumerate(order):
            out_q.append(qi); out_r.append(rank)
            out_id.append(int(sub_ids[c])); out_s.append(float(sims[c]))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "vec_id": pa.array(out_id, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        }
    )

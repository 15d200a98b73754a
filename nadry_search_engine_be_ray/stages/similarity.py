"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — a broadcast query matrix (``ray.put``
once), per-batch numpy matmul emitting per-batch partial top-k, then a tiny
``groupby(query_id)`` merge.  Scale paths: LSH (random-hyperplane) bucketing
and IVF (coarse k-means quantizer) — both probe only a candidate subset per
query, inside the same partial-topk/merge skeleton, so no stage ever
materializes the corpus on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _batch_matrix(
    batch: pa.Table, vec_col: str, dtype=np.float64
) -> np.ndarray:
    """(n, dim) matrix from a list<numeric> / fixed_size_list column —
    zero-copy flatten when row lengths are uniform (the common case),
    Python fallback otherwise.  The single vector-decode helper for every
    hot stage (similarity / clustering / PQ / embedding dedup)."""
    col = batch[vec_col].combine_chunks()
    try:
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = len(col)
        if n and flat.size % n == 0:
            if pa.types.is_fixed_size_list(col.type):
                return flat.astype(dtype).reshape(n, -1)
            lens = col.value_lengths().to_numpy(zero_copy_only=False)
            if lens.min() == lens.max():
                return flat.astype(dtype).reshape(n, -1)
    except (pa.ArrowInvalid, ValueError):
        pass
    return np.stack([np.asarray(v, dtype=dtype) for v in col.to_pylist()])


def matrix_to_list_column(mat: np.ndarray, value_type=None) -> pa.Array:
    """Inverse of ``_batch_matrix``: a (n, dim) matrix -> list<value_type>
    array built from the flattened values + arithmetic offsets, with no
    per-row Python objects."""
    n, d = mat.shape
    value_type = value_type or pa.from_numpy_dtype(mat.dtype)
    offsets = pa.array(
        np.arange(0, (n + 1) * d, d, dtype=np.int32), pa.int32()
    )
    values = pa.array(np.ascontiguousarray(mat).ravel()).cast(value_type)
    return pa.ListArray.from_arrays(offsets, values)


def _topk_deterministic(sims: np.ndarray, ids: np.ndarray, kk: int) -> np.ndarray:
    """Per-batch top-k indices under the declared (-cosine, vec_id) order:
    argpartition picks arbitrarily among equal cosines at the k boundary, so
    keep every boundary tie and lexsort the candidate set before cutting —
    deterministic without sorting the whole batch."""
    part = np.argpartition(-sims, kk - 1)[:kk]
    thresh = sims[part].min()
    cand = np.flatnonzero(sims >= thresh)
    order = np.lexsort((ids[cand], -sims[cand]))[:kk]
    return cand[order]


def _make_merge_topk(k: int):
    """Per-query merge of partial top-k rows -> final (rank'd) top-k."""

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

    return merge_topk


def _finalize(merged, k: int) -> pa.Table:
    out = merged.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


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
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = qm @ m.T  # (n_queries, batch)
        out_q, out_id, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            idx = _topk_deterministic(sims[qi], ids, kk)
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

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    merged = partials.groupby("query_id").map_groups(
        _make_merge_topk(k), batch_format="pyarrow"
    )
    return _finalize(merged, k)


def hard_negatives_topk(ds, query_vectors: np.ndarray,
                        query_labels: np.ndarray, k: int = 10,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        label_col: str = "label") -> pa.Table:
    """Hard-negative mining for contrastive training: for each query
    vector, the exact cosine top-k among vectors with a DIFFERENT label
    (the most-confusable negatives).  Same partial-topk + per-query merge
    shape as brute_force_topk — the label mask is applied inside the
    batch scoring, so excluded rows never enter the candidate stream.
    Returns (query_id, rank, vec_id, cosine), (-cosine, vec_id) order."""
    import ray

    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    ql = np.asarray(query_labels)
    qref = ray.put((q, ql))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm, qlab = ray.get(qref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        labs = batch[label_col].to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = qm @ m.T
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            neg = labs != qlab[qi]
            if not neg.any():
                continue
            s_neg, ids_neg = sims[qi][neg], ids[neg]
            idx = _topk_deterministic(s_neg, ids_neg,
                                      min(k, ids_neg.size))
            for c in idx:
                out_q.append(qi)
                out_id.append(int(ids_neg[c]))
                out_s.append(float(s_neg[c]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    merged = partials.groupby("query_id").map_groups(
        _make_merge_topk(k), batch_format="pyarrow"
    )
    return _finalize(merged, k)


class LshIndexBatch:
    """map_batches stage: assign each vector a random-hyperplane bucket."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 11,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.vec_col)
        signs = (m @ self.planes.T) > 0
        buckets = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)
        return batch.append_column("bucket", pa.array(buckets, pa.int64()))


def _probed_partial_topk(ds, q: np.ndarray, probe_of_query: list[set[int]],
                         bucket_col: str, k: int, id_col: str, vec_col: str):
    """Shared LSH/IVF skeleton: per batch, for each query score ONLY the rows
    whose bucket/list is in that query's probe set (partial top-k), then
    groupby(query_id) merge — fully distributed, candidates never leave the
    workers unranked."""
    import ray

    qref = ray.put(q)
    probes_ref = ray.put([np.array(sorted(s), dtype=np.int64) for s in probe_of_query])

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        probes = ray.get(probes_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        buckets = batch[bucket_col].to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(batch, vec_col))
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(buckets, probes[qi])
            if not mask.any():
                continue
            sims = qm[qi] @ m[mask].T
            sub_ids = ids[mask]
            kk = min(k, sims.size)
            idx = _topk_deterministic(sims, sub_ids, kk)
            for c in idx:
                out_q.append(qi)
                out_id.append(int(sub_ids[c]))
                out_s.append(float(sims[c]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(
        _make_merge_topk(k), batch_format="pyarrow"
    )


def lsh_probe_lists(q: np.ndarray, planes: np.ndarray, n_planes: int,
                    n_probes: int) -> list[list[int]]:
    """Per-query probe buckets: the ``n_probes`` nearest buckets by hamming
    distance on the sign pattern (stable argsort order).  Shared by
    :func:`lsh_topk` and the dumped-assignment oracles so the dumped probe
    sets can never drift from what the engine probes."""
    q_signs = (q @ planes.T) > 0
    q_buckets = (q_signs * (1 << np.arange(n_planes))).sum(axis=1)
    all_buckets = np.arange(1 << n_planes)
    out = []
    for qb in q_buckets:
        ham = np.array([bin(int(qb) ^ int(b)).count("1") for b in all_buckets])
        order = np.argsort(ham, kind="stable")
        out.append([int(x) for x in all_buckets[order[:n_probes]]])
    return out


def ivf_probe_lists(q_norm: np.ndarray, centroids: np.ndarray,
                    n_probes: int) -> list[list[int]]:
    """Per-query probed IVF lists: the ``n_probes`` nearest centroids by
    cosine (stable argsort).  Shared by :func:`ivf_topk` and the
    dumped-assignment oracles."""
    sims = q_norm @ centroids.T
    np_probe = min(n_probes, centroids.shape[0])
    return [
        [int(x) for x in np.argsort(-sims[qi], kind="stable")[:np_probe]]
        for qi in range(q_norm.shape[0])
    ]


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

    probe_sets = [set(p) for p in lsh_probe_lists(q, stage.planes,
                                                  n_planes, n_probes)]
    merged = _probed_partial_topk(
        bucketed, q, probe_sets, "bucket", k, id_col, vec_col
    )
    return _finalize(merged, k)


def train_ivf_centroids(ds, n_lists: int = 16, train_size: int = 4096,
                        n_iters: int = 10, seed: int = 13,
                        vec_col: str = "embedding") -> np.ndarray:
    """Coarse quantizer: Lloyd k-means on a bounded training sample (the
    only driver-side materialization, capped at ``train_size`` rows —
    standard IVF practice: train on a sample, assign in parallel)."""
    sample = ds.limit(train_size).to_pandas()
    x = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(x.shape[0], size=min(n_lists, x.shape[0]), replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(x @ cent.T, axis=1)          # cosine on unit vectors
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


class IvfAssignBatch:
    """map_batches stage: nearest-centroid list id per vector."""

    def __init__(self, centroids: np.ndarray, vec_col: str = "embedding"):
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        lists = np.argmax(m @ self.centroids.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_list", pa.array(lists, pa.int64()))


def ivf_topk(ds, query_vectors: np.ndarray, k: int = 10, n_lists: int = 16,
             n_probes: int = 4, seed: int = 13, id_col: str = "vec_id",
             vec_col: str = "embedding", centroids: np.ndarray | None = None) -> pa.Table:
    """IVF approximate cosine top-k: train a coarse k-means quantizer on a
    sample, assign vectors to inverted lists in parallel, then scan only the
    ``n_probes`` lists whose centroids are nearest each query.  Same output
    schema as brute force.  Pass precomputed ``centroids`` to reuse a
    trained quantizer (at scale the assignment would also be persisted as a
    partition column so probes prune at the read)."""
    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    if centroids is None:
        centroids = train_ivf_centroids(
            ds, n_lists=n_lists, seed=seed, vec_col=vec_col
        )
    assigned = ds.map_batches(
        IvfAssignBatch(centroids, vec_col), batch_format="pyarrow"
    )
    probe_sets = [set(p) for p in ivf_probe_lists(q, centroids, n_probes)]
    merged = _probed_partial_topk(
        assigned, q, probe_sets, "ivf_list", k, id_col, vec_col
    )
    return _finalize(merged, k)


def mmr_diversify(ds, query_vector: np.ndarray, k: int = 5,
                  n_candidates: int = 20, lam: float = 0.5,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> "pd.DataFrame":
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): retrieve the cosine top-``n_candidates`` for the query,
    then greedily pick ``k`` results maximizing
    ``lam*cos(q,d) - (1-lam)*max_{s in S} cos(d,s)`` — relevance traded
    against redundancy with the already-selected set.

    Determinism: candidate membership and every greedy argmax operate on
    6-dp-ROUNDED cosines (ties by id), so the whole chain is bit-equal to
    the unrolled-CTE DuckDB oracle.  Scale shape: the retrieval leg is
    the distributed partial-top-k pipeline; the greedy loop is a bounded
    k x n_candidates driver re-rank (candidate-sized, never corpus-sized),
    exactly how a serving tier would run MMR per query.
    """
    import pandas as pd
    import pyarrow.compute as _pc
    import ray

    q = np.asarray(query_vector, dtype=np.float64).reshape(1, -1)
    # margin past n_candidates on the raw ranking, cut on the rounded one
    top = brute_force_topk(
        ds, q, k=n_candidates + 32, id_col=id_col, vec_col=vec_col
    ).to_pandas()
    top["cosine"] = top["cosine"].round(6)
    top = top.sort_values(["cosine", "vec_id"], ascending=[False, True])
    top = top.head(n_candidates).reset_index(drop=True)
    cand_ids = top["vec_id"].to_numpy()

    idset = ray.put(np.sort(cand_ids))

    def pick(batch: pa.Table) -> pa.Table:
        ids = np.sort(ray.get(idset))
        bid = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ids, bid)
        pos[pos == ids.size] = 0
        keep = ids[pos] == bid
        return batch.filter(pa.array(keep))

    emb = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    emb = emb.set_index(id_col).loc[cand_ids]
    mat = _normalize(np.stack(emb[vec_col].to_numpy()).astype(np.float64))
    sims = np.round(mat @ mat.T, 6)      # pairwise candidate cosines
    cos = top["cosine"].to_numpy()

    selected: list[int] = []
    sel_rows: list[tuple[int, int, float]] = []
    avail = np.ones(len(cand_ids), dtype=bool)
    for rank in range(1, min(k, len(cand_ids)) + 1):
        if selected:
            red = sims[:, selected].max(axis=1)
        else:
            red = np.zeros(len(cand_ids))
        mmr = np.round(lam * cos - (1 - lam) * red, 6)
        mmr_masked = np.where(avail, mmr, -np.inf)
        best = np.lexsort((cand_ids, -mmr_masked))[0]
        selected.append(best)
        avail[best] = False
        sel_rows.append((rank, int(cand_ids[best]), float(mmr[best])))
    return pd.DataFrame(
        sel_rows, columns=["rank", "vec_id", "mmr_score"]
    ).astype({"rank": "int64", "vec_id": "int64"})


def pca_top_component(ds, iters: int = 8, round_cov: int = 6):
    """Top principal component by power iteration (the distributed-PCA
    baseline): each batch contributes the Gram-matrix partials
    (X^T X, column sums, count) via one zero-copy ``_batch_matrix`` +
    ``einsum`` — a dim^2-sized exchange independent of row count — and
    the driver forms the covariance, ROUNDS it to ``round_cov`` decimals
    (so an independent engine recomputing the same rounded covariance
    from the same rows starts the iteration from bit-identical state),
    then runs ``iters`` matrix-vector products from the uniform unit
    vector.  Returns (loadings, last_norm) — the last norm is the
    Rayleigh eigenvalue estimate of an almost-converged iterate."""

    def gram_partial(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch, "embedding")
        g = np.einsum("ni,nj->ij", x, x)
        dim = x.shape[1]
        i, j = np.meshgrid(np.arange(dim, dtype=np.int64),
                           np.arange(dim, dtype=np.int64), indexing="ij")
        return pa.table({
            "i": pa.array(
                np.concatenate([i.ravel(), np.arange(dim), [-1]]),
                pa.int64()),
            "j": pa.array(
                np.concatenate([j.ravel(), np.full(dim, -1), [-1]]),
                pa.int64()),
            "v": pa.array(
                np.concatenate([g.ravel(), x.sum(axis=0),
                                [float(x.shape[0])]]),
                pa.float64()),
        })

    parts = (ds.map_batches(gram_partial, batch_format="pyarrow")
             .to_pandas().groupby(["i", "j"], as_index=False)
             .agg(v=("v", "sum")))
    n = float(parts.loc[(parts["i"] == -1) & (parts["j"] == -1), "v"].iloc[0])
    sums = (parts[(parts["j"] == -1) & (parts["i"] >= 0)]
            .sort_values("i")["v"].to_numpy())
    dim = sums.size
    gram = np.zeros((dim, dim))
    sq = parts[(parts["i"] >= 0) & (parts["j"] >= 0)]
    gram[sq["i"].to_numpy(np.int64), sq["j"].to_numpy(np.int64)] = \
        sq["v"].to_numpy()
    cov = np.round((gram - np.outer(sums, sums) / n) / n, round_cov)
    v = np.full(dim, 1.0 / np.sqrt(dim))
    nrm = 0.0
    for _ in range(iters):
        w = cov @ v
        nrm = float(np.sqrt((w * w).sum()))
        v = w / nrm
    return v, nrm


def sq_topk(ds, queries: np.ndarray, k: int = 5, levels: int = 255):
    """Scalar-quantized (int8-style) ANN: pass 1 folds per-dimension
    min/max partials (dim-sized exchange), every batch then quantizes
    its vectors to ``levels`` uniform codes and scores queries by dot
    product against DEQUANTIZED codes — the SQ codec every vector store
    ships next to PQ, here with the same partial-topk/merge skeleton as
    brute force.  Quantization q = floor((x - min) / step) (clamped to
    levels) is one double expression an external engine reproduces
    bit-identically.  Returns (query_id, rank, vec_id, score) with rank
    on 6-dp-rounded scores, vec_id-asc ties."""
    from ray.data.aggregate import Max, Min

    def minmax_partial(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch, "embedding")
        dim = x.shape[1]
        return pa.table({
            "i": pa.array(np.arange(dim, dtype=np.int64), pa.int64()),
            "lo": pa.array(x.min(axis=0), pa.float64()),
            "hi": pa.array(x.max(axis=0), pa.float64()),
        })

    mm = (ds.map_batches(minmax_partial, batch_format="pyarrow")
          .groupby("i")
          .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
          .to_pandas().sort_values("i"))
    lo = mm["lo"].to_numpy(np.float64)
    hi = mm["hi"].to_numpy(np.float64)
    step = (hi - lo) / levels
    step = np.where(step == 0, 1.0, step)  # constant dims -> code 0
    import ray

    ref = ray.put((lo, step, queries.astype(np.float64)))

    def score_partial(batch: pa.Table) -> pa.Table:
        lo_b, step_b, q = ray.get(ref)
        x = _batch_matrix(batch, "embedding")
        codes = np.minimum(
            np.floor((x - lo_b) / step_b), levels).astype(np.int64)
        deq = lo_b + (codes + 0.5) * step_b
        sims = np.round(deq @ q.T, 6)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_v, out_s = [], [], []
        for qi in range(q.shape[0]):
            s = sims[:, qi]
            order = np.lexsort((ids, -s))[:k]
            out_q.extend([qi] * len(order))
            out_v.extend(ids[order])
            out_s.extend(s[order])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(np.asarray(out_v, np.int64), pa.int64()),
            "score": pa.array(np.asarray(out_s, np.float64), pa.float64()),
        })

    import pandas as pd

    parts = (ds.map_batches(score_partial, batch_format="pyarrow")
             .to_pandas())
    outs = []
    for qi, g in parts.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        outs.append(g)
    return pa.Table.from_pandas(
        pd.concat(outs)[["query_id", "rank", "vec_id", "score"]],
        preserve_index=False)

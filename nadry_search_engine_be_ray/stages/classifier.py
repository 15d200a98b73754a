"""Distributed linear quality classifier (logistic regression over an
embedding column).

The fasttext-style quality-classifier step of a training-data pipeline
(score every document, keep the confident ones) needs corpus-scale TRAIN
and PREDICT.  Both are expressed with the same bounded-combine shape as
``stages/clustering.py``:

* ``lr_fit`` — full-batch gradient descent in the data-parallel
  parameter-server shape: the feature blocks are pinned in the object
  store ONCE (Dataset -> Arrow block refs), a pool of gradient workers
  each fetches ITS shard of blocks once in ``__init__`` (and pre-builds
  the design matrix), and every iteration is one actor-method wave —
  weights out, one thin (dim+1)-vector partial PER BLOCK back, combined
  on the driver (≤ n_blocks rows).  No per-iteration pipeline launch, no
  per-iteration block fetch; the per-iteration exchange is kilobytes
  regardless of corpus size.
* ``lr_predict`` — shuffle-free ``map_batches`` sigmoid scoring against
  the broadcast weights.

Deterministic: fixed iteration count, zero init, no RNG anywhere; the
driver combine sorts partials before summing.  At 100 TB the gradient
exchange is n_blocks × (dim+1) doubles per iteration — kilobytes — and
the feature matrix never moves; mini-batch/ADAM variants would sample
blocks per iteration with the same shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .clustering import _matrix


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def lr_fit(ds, label_col: str = "y", vec_col: str = "embedding",
           n_iters: int = 30, lr: float = 1.0, l2: float = 0.0) -> np.ndarray:
    """Train logistic regression; returns weights of length dim+1 (bias
    LAST).  ``label_col`` must be 0/1 (or bool)."""
    import ray

    feats = ds.map_batches(
        lambda b: b.select([label_col, vec_col]), batch_format="pyarrow"
    )
    # pin the feature blocks in the object store once; a worker pool holds
    # shard state across iterations (fetch + design-matrix build happen
    # ONCE per worker, not once per iteration).  A worker still emits one
    # partial PER BLOCK, so the combined multiset (and the float sum) is
    # independent of how blocks are sharded over workers.
    block_refs = feats.to_arrow_refs()
    n_workers = max(
        1,
        min(len(block_refs), int(ray.cluster_resources().get("CPU", 8))),
    )

    @ray.remote
    class _GradWorker:
        def __init__(self, refs: list):
            self.blocks = []
            for tbl in ray.get(refs):
                x = _matrix(tbl, vec_col)
                xa = np.hstack([x, np.ones((x.shape[0], 1))])
                y = np.asarray(
                    tbl[label_col].to_pylist(), dtype=np.float64
                )
                self.blocks.append((xa, y))

        def grad(self, cur) -> list:
            out = []
            for xa, y in self.blocks:
                c = np.zeros(xa.shape[1]) if cur is None else cur
                p = _sigmoid(xa @ c)
                out.append((xa.T @ (p - y), xa.shape[0]))
            return out

    workers = [
        _GradWorker.remote(block_refs[i::n_workers])
        for i in range(n_workers)
    ]

    n_total = None
    w: np.ndarray | None = None
    for _ in range(n_iters):
        parts = [
            p
            for chunk in ray.get([wk.grad.remote(w) for wk in workers])
            for p in chunk
        ]  # ≤ n_blocks thin rows — the bounded combine
        if n_total is None:
            n_total = sum(p[1] for p in parts)
        gs = np.stack([p[0] for p in parts])
        # sort partials bytewise so the float sum order is independent of
        # block arrival order
        order = np.lexsort(gs.T[::-1])
        g = gs[order].sum(axis=0) / n_total
        if w is None:
            w = np.zeros(gs.shape[1])
        if l2:
            g = g + l2 * w
        w = w - lr * g
    return w


class LrPredictBatch:
    """Broadcast-weights sigmoid scorer (score rounded to 6 decimals for
    SQL-oracle float stability; pred = score >= 0.5)."""

    def __init__(self, w_ref, vec_col: str = "embedding"):
        import ray

        w = ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef) else w_ref
        self.w = np.asarray(w, dtype=np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _matrix(batch, self.vec_col)
        z = x @ self.w[:-1] + self.w[-1]
        s = _sigmoid(z)
        return batch.append_column(
            "score", pa.array(np.round(s, 6), pa.float64())
        ).append_column("pred", pa.array(s >= 0.5, pa.bool_()))


def lr_predict(ds, w: np.ndarray, vec_col: str = "embedding"):
    """Append (score, pred) from the trained weights; shuffle-free."""
    import ray

    w_ref = ray.put(np.asarray(w, dtype=np.float64))

    def predict(batch: pa.Table) -> pa.Table:
        return LrPredictBatch(ray.get(w_ref), vec_col)(batch)

    return ds.map_batches(predict, batch_format="pyarrow")

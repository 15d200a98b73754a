"""Distributed linear quality classifier (logistic regression over an
embedding column).

The fasttext-style quality-classifier step of a training-data pipeline
(score every document, keep the confident ones) needs corpus-scale TRAIN
and PREDICT.  Both are expressed with the same bounded-combine shape as
``stages/clustering.py``:

* ``lr_fit`` — full-batch gradient descent; each iteration is one
  shuffle-free ``map_batches`` over the (object-store-resident) feature
  matrix emitting ONE thin row per block — the (dim+1)-vector partial
  gradient and its row count — combined on the driver (≤ n_blocks rows).
  The weight vector broadcasts per iteration via ``ray.put``.
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
    ).materialize()

    n_total = feats.count()
    w: np.ndarray | None = None
    for _ in range(n_iters):
        w_ref = ray.put(w)

        def grad_partial(batch: pa.Table, _w_ref=w_ref) -> pa.Table:
            cur = ray.get(_w_ref)
            x = _matrix(batch, vec_col)
            xa = np.hstack([x, np.ones((x.shape[0], 1))])
            if cur is None:
                cur = np.zeros(xa.shape[1])
            y = np.asarray(batch[label_col].to_pylist(), dtype=np.float64)
            p = _sigmoid(xa @ cur)
            g = xa.T @ (p - y)
            return pa.table(
                {
                    "g": pa.array([g], pa.list_(pa.float64())),
                    "n": pa.array([x.shape[0]], pa.int64()),
                }
            )

        parts = feats.map_batches(
            grad_partial, batch_format="pyarrow"
        ).to_pandas()  # ≤ n_blocks thin rows — the bounded combine
        gs = np.stack(parts["g"].to_list())
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

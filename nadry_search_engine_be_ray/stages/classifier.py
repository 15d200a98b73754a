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
import pyarrow.compute as pc

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
    from .blocks import nonempty_refs
    block_refs = nonempty_refs(feats, [label_col, vec_col])
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
                y = tbl[label_col].to_numpy(
                    zero_copy_only=False).astype(np.float64)
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


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes over a text column
# ---------------------------------------------------------------------------

def nb_fit(ds, text_col: str = "text", label_col: str = "lang"):
    """Train a multinomial Naive Bayes text classifier (Laplace α=1).

    Distributed shape: each batch pre-aggregates (label, token) counts
    through one pyarrow group_by (tokens never leave Arrow), one Ray
    groupby on the composed ``label\\x1ftoken`` key folds them globally,
    and ONLY the model-sized (vocab × labels, bounded like the LM
    broadcast models) count table reaches the driver.  Priors come from
    a doc-count aggregate of the same scan shape.

    Returns ``(labels, log_prior, keys, logp, default_logp)``:
    ``keys``/``logp`` give per-(label,token) log P(tok|label) as a flat
    Arrow probe table (``lookup_counts`` fast path), ``default_logp`` the
    per-label unseen-token mass log(1/(tot_l + V))."""
    from .lm import exploded_tokens

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, lens = exploded_tokens(batch[text_col])
        labels = batch[label_col].to_numpy(zero_copy_only=False)
        doc_pos = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        composed = pc.binary_join_element_wise(
            pa.array(labels[doc_pos].astype(str)), flat, "\x1f")
        t = pa.table({
            "k": composed,
            "cnt": pa.array(np.ones(len(composed), np.int64), pa.int64()),
        }).group_by(["k"]).aggregate([("cnt", "sum")])
        t = t.rename_columns(
            [{"cnt_sum": "cnt"}.get(c, c) for c in t.column_names])
        ls, inv = np.unique(labels, return_inverse=True)
        docs = pa.table({
            "k": pa.array(["\x00docs\x1f" + str(l) for l in ls]),
            "cnt": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
        })
        return pa.concat_tables([t, docs])

    from ray.data.aggregate import Sum

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("k").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())
    kk = counts["k"].astype(str)
    is_doc = kk.str.startswith("\x00docs\x1f")
    doc_counts = {k.split("\x1f", 1)[1]: int(c)
                  for k, c in zip(kk[is_doc], counts["cnt"][is_doc])}
    tok = counts[~is_doc].copy()
    lab_tok = kk[~is_doc].str.split("\x1f", n=1, expand=True)
    tok["label"], tok["token"] = lab_tok[0].to_numpy(), lab_tok[1].to_numpy()

    labels = np.array(sorted(doc_counts))
    n_docs = sum(doc_counts.values())
    log_prior = np.log(np.array([doc_counts[l] for l in labels], np.float64)
                       / n_docs)
    vocab_size = tok["token"].nunique()
    tot = tok.groupby("label")["cnt"].sum()
    tot_l = np.array([float(tot.get(l, 0.0)) for l in labels])
    default_logp = -np.log(tot_l + vocab_size)
    # per-(label,token) delta over the unseen default, probed flat
    li = np.searchsorted(labels, tok["label"].to_numpy())
    logp = (np.log(tok["cnt"].to_numpy(np.float64) + 1.0)
            - np.log(tot_l[li] + vocab_size))
    keys = pa.array(tok["label"].to_numpy().astype(object)
                    + "\x1f" + tok["token"].to_numpy().astype(object))
    return labels, log_prior, keys, logp, default_logp


def nb_classify(ds, model, text_col: str = "text",
                id_col: str = "doc_id",
                passthrough: tuple = ()) -> "pa.Table":
    """Score every document against the broadcast NB model and emit
    (id, pred_label, score): argmax over labels of
    log prior + Σ_tok log P(tok|label), ties broken by label order.
    One ``lookup_counts`` probe per label per batch — vectorized, model
    read from the object store once per task."""
    import ray

    from .lm import exploded_tokens, lookup_counts

    ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        labels, log_prior, keys, logp, default_logp = ray.get(ref)
        doc_pos, flat, lens = exploded_tokens(batch[text_col])
        n = batch.num_rows
        scores = np.tile(log_prior, (n, 1))
        for j, lab in enumerate(labels):
            composed = pc.binary_join_element_wise(
                pa.array(np.repeat(lab, len(flat))), flat, "\x1f")
            delta = lookup_counts(composed, keys, logp - default_logp[j])
            per_tok = default_logp[j] + delta
            scores[:, j] += np.bincount(doc_pos, weights=per_tok,
                                        minlength=n) + 0.0
        best = np.argmax(scores, axis=1)  # ties -> lowest label index
        cols = {
            id_col: batch[id_col],
            "pred_label": pa.array(labels[best]),
            "score": pa.array(
                np.round(scores[np.arange(n), best], 4), pa.float64()),
        }
        for c in passthrough:  # e.g. the truth label for evaluation
            cols[c] = batch[c]
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")

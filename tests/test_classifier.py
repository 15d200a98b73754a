"""Distributed logistic regression (golden + invariant tests; driver SQL
conformance for lr_quality_scores lives in test_entry_contract)."""

import numpy as np
import pyarrow as pa
import ray

from nadry_search_engine_be_ray.stages import classifier


def _blob_ds(n=120, dim=6, seed=7, sep=3.0):
    rng = np.random.default_rng(seed)
    x0 = rng.standard_normal((n // 2, dim)) - sep / 2
    x1 = rng.standard_normal((n // 2, dim)) + sep / 2
    x = np.vstack([x0, x1])
    y = np.array([0] * (n // 2) + [1] * (n // 2), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "y": pa.array(y, pa.int64()),
            "embedding": pa.array([r for r in x], pa.list_(pa.float64())),
        }
    )
    return ray.data.from_arrow(tbl), x, y


def test_lr_learns_separable_blobs(ray_session):
    ds, x, y = _blob_ds()
    w = classifier.lr_fit(ds.repartition(4), n_iters=40, lr=1.0)
    assert w.shape == (7,)
    out = classifier.lr_predict(ds, w).to_pandas().sort_values("vec_id")
    acc = (out["pred"].to_numpy() == y.astype(bool)).mean()
    assert acc == 1.0


def test_lr_fit_matches_local_full_batch(ray_session):
    ds, x, y = _blob_ds(n=60)
    w = classifier.lr_fit(ds.repartition(3), n_iters=5, lr=0.3)
    # independent local reference
    xa = np.hstack([x, np.ones((len(x), 1))])
    wref = np.zeros(xa.shape[1])
    for _ in range(5):
        p = 1.0 / (1.0 + np.exp(-(xa @ wref)))
        wref = wref - 0.3 * (xa.T @ (p - y) / len(x))
    np.testing.assert_allclose(w, wref, rtol=1e-9, atol=1e-12)


def test_lr_deterministic_under_partitioning(ray_session):
    ds1, _, _ = _blob_ds()
    ds2, _, _ = _blob_ds()
    w1 = classifier.lr_fit(ds1.repartition(2), n_iters=8)
    w2 = classifier.lr_fit(ds2.repartition(7), n_iters=8)
    np.testing.assert_allclose(w1, w2, rtol=1e-9, atol=1e-12)


def test_lr_predict_formula(ray_session):
    ds, x, _ = _blob_ds(n=20)
    w = np.linspace(-1, 1, 7)
    out = classifier.lr_predict(ds, w).to_pandas().sort_values("vec_id")
    z = x @ w[:-1] + w[-1]
    s = np.round(1.0 / (1.0 + np.exp(-z)), 6)
    np.testing.assert_allclose(out["score"].to_numpy(), s, atol=1e-12)
    assert (out["pred"].to_numpy() == (1.0 / (1.0 + np.exp(-z)) >= 0.5)).all()

"""Product-quantization ANN: brute-force parity for train/encode/ADC,
determinism, ranking contract (driver SQL conformance for pq_ann_topk
lives in the sweep)."""

import numpy as np
import pyarrow as pa
import ray

from nadry_search_engine_be_ray.stages import pq
from nadry_search_engine_be_ray.stages.similarity import _normalize


def _emb_ds(n=40, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "embedding": pa.array([list(r) for r in x], pa.list_(pa.float64())),
        }
    )
    return ray.data.from_arrow(tbl).repartition(3), x


def _brute_codes(x, cb):
    xn = _normalize(x.astype(np.float64))
    m = cb.shape[0]
    sub = xn.reshape(len(xn), m, -1)
    codes = np.empty((len(xn), m), dtype=np.int64)
    for j in range(m):
        d2 = ((sub[:, j, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def test_train_encode_adc_brute_parity(ray_session):
    ds, x = _emb_ds()
    cb, normed = pq.pq_train(ds, m=4, k=8, n_iters=4)
    assert cb.shape == (4, 8, 4)
    codes_df = (
        pq.pq_encode(normed, cb).to_pandas().sort_values("vec_id")
    )
    exp_codes = _brute_codes(x, cb)
    got_codes = np.array(codes_df["code"].to_list())
    assert (got_codes == exp_codes).all()

    q = x[:2]
    out = pq.pq_adc_topk(
        pq.pq_encode(normed, cb), q, cb,
        qv_ids=np.array([0, 1]), k=5,
    ).to_pandas()
    # brute ADC: table lookups over the same codes
    qn = _normalize(q.astype(np.float64)).reshape(2, 4, -1)
    tables = (
        np.sqrt(((qn[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3))
        ** 2
    )
    for qi in (0, 1):
        dist = np.round(
            tables[qi][np.arange(4)[None, :], exp_codes].sum(axis=1), 6
        )
        order = np.lexsort((np.arange(len(x)), dist))[:5]
        got = out[out["query_id"] == qi].sort_values("rank")
        assert list(got["vec_id"]) == list(order)
        assert list(got["adc_dist"]) == list(dist[order])


def test_train_deterministic(ray_session):
    ds, _ = _emb_ds()
    cb1, _ = pq.pq_train(ds, m=4, k=8, n_iters=3)
    cb2, _ = pq.pq_train(ds, m=4, k=8, n_iters=3)
    assert (cb1 == cb2).all()


def test_self_query_ranks_high(ray_session):
    """A corpus vector queried against the index should place itself
    top-1: its ADC distance equals the minimal quantization error."""
    ds, x = _emb_ds(n=30, dim=16, seed=9)
    cb, normed = pq.pq_train(ds, m=4, k=16, n_iters=6)
    out = pq.pq_adc_topk(
        pq.pq_encode(normed, cb), x[7:8], cb, qv_ids=np.array([7]), k=3
    ).to_pandas()
    assert out.loc[0, "vec_id"] == 7


def test_dim_not_divisible_raises(ray_session):
    ds, _ = _emb_ds(n=10, dim=10)
    try:
        pq.pq_train(ds, m=4, k=4, n_iters=1)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_ivfpq_prunes_and_matches_brute(ray_session):
    """IVF-PQ equals brute ADC restricted to the probed lists, and the
    probed candidate set is a strict subset when n_probes < n_lists."""
    from nadry_search_engine_be_ray.stages.similarity import (
        IvfAssignBatch, ivf_probe_lists, train_ivf_centroids,
    )

    ds, x = _emb_ds(n=60, dim=16, seed=5)
    cent = train_ivf_centroids(ds, n_lists=4, seed=13)
    cb, normed = pq.pq_train(ds, m=4, k=8, n_iters=4)
    encoded = pq.pq_encode(
        normed.map_batches(IvfAssignBatch(cent), batch_format="pyarrow"),
        cb, extra_cols=("ivf_list",),
    ).materialize()

    q = x[:2]
    qn = _normalize(q.astype(np.float64))
    probes = ivf_probe_lists(qn, cent, 2)
    out = pq.ivfpq_adc_topk(
        encoded, q, cb, qv_ids=np.array([0, 1]),
        probe_of_query=[set(p) for p in probes], k=5,
    ).to_pandas()

    # brute: assignment + codes recomputed, candidates filtered by probe
    asg = encoded.to_pandas().sort_values("vec_id")
    lists = asg["ivf_list"].to_numpy(np.int64)
    exp_codes = _brute_codes(x, cb)
    qsub = qn.reshape(2, 4, -1)
    tables = (
        np.sqrt(((qsub[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3))
        ** 2
    )
    for qi in (0, 1):
        hit = np.isin(lists, np.array(sorted(probes[qi])))
        ids = np.arange(len(x))[hit]
        dist = np.round(
            tables[qi][np.arange(4)[None, :], exp_codes[hit]].sum(axis=1), 6
        )
        order = np.lexsort((ids, dist))[:5]
        got = out[out["query_id"] == qi].sort_values("rank")
        assert list(got["vec_id"]) == list(ids[order])
        assert list(got["adc_dist"]) == list(dist[order])
        # the prune is real: not every vector is a candidate
        assert hit.sum() < len(x)


def test_pq_encode_passthrough_cols(ray_session):
    ds, x = _emb_ds(n=10, dim=16, seed=7)
    with_part = ds.map_batches(
        lambda b: b.append_column(
            "tag",
            pa.array((b["vec_id"].to_numpy(zero_copy_only=False) % 3),
                     pa.int64()),
        ),
        batch_format="pyarrow",
    )
    cb, normed = pq.pq_train(with_part, m=4, k=4, n_iters=2)
    # normalize drops extra cols in pq_train's normed; re-attach on raw ds
    enc = pq.pq_encode(
        with_part, cb, extra_cols=("tag",)
    ).to_pandas().sort_values("vec_id")
    assert list(enc.columns) == ["vec_id", "code", "tag"]
    assert (enc["tag"].to_numpy() == np.arange(10) % 3).all()

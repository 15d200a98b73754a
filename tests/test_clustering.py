"""Distributed k-means + SemDeDup (golden/invariant tests; SQL conformance
for the driver queries lives in test_entry_contract)."""

import numpy as np
import pyarrow as pa
import ray

from nadry_search_engine_be_ray.stages import clustering


def _blob_ds(n_per=40, dim=8, seed=3, spread=0.05):
    """Three well-separated unit-vector blobs around orthogonal axes."""
    rng = np.random.default_rng(seed)
    mats, labels = [], []
    for axis in range(3):
        base = np.zeros(dim)
        base[axis] = 1.0
        pts = base + spread * rng.standard_normal((n_per, dim))
        mats.append(pts)
        labels += [axis] * n_per
    mat = np.vstack(mats)
    ids = np.arange(len(mat), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([r for r in mat], pa.list_(pa.float64())),
        }
    )
    return ray.data.from_arrow(tbl).repartition(4), np.array(labels)


def test_kmeans_recovers_blobs(ray_session):
    ds, labels = _blob_ds()
    cent, normed = clustering.kmeans_fit(ds, k=3, n_iters=8)
    assert cent.shape == (3, 8)
    # centroids are unit norm
    np.testing.assert_allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-9)
    out = (
        clustering.kmeans_assign(normed, cent, normalized=True)
        .to_pandas()
        .sort_values("vec_id")
    )
    # each true blob maps to exactly one cluster id (perfect separation)
    got = out["cluster"].to_numpy()
    for axis in range(3):
        assert len(set(got[labels == axis])) == 1
    assert len(set(got)) == 3


def test_kmeans_deterministic_under_partitioning(ray_session):
    ds1, _ = _blob_ds()
    ds2, _ = _blob_ds()
    c1, _ = clustering.kmeans_fit(ds1, k=3, n_iters=4)
    c2, _ = clustering.kmeans_fit(ds2.repartition(9), k=3, n_iters=4)
    np.testing.assert_allclose(c1, c2, atol=1e-12)


def test_assign_tie_breaks_to_lowest_cluster(ray_session):
    ds, _ = _blob_ds(n_per=5)
    cent, normed = clustering.kmeans_fit(ds, k=2, n_iters=2)
    dup = np.vstack([cent[0], cent[0]])  # identical centroids
    out = clustering.kmeans_assign(normed, dup, normalized=True).to_pandas()
    assert (out["cluster"] == 0).all()


def test_semdedup_finds_planted_pairs(ray_session):
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((60, 16))
    ids = np.arange(60, dtype=np.int64)
    # plant: copies of rows 0..4 scaled by 2 (cosine exactly 1)
    planted = mat[:5] * 2.0
    full = np.vstack([mat, planted])
    fids = np.concatenate([ids, ids[:5] + 1000])
    tbl = pa.table(
        {
            "vec_id": pa.array(fids, pa.int64()),
            "embedding": pa.array([r for r in full], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = (
        clustering.semdedup_pairs(ds, k=4, threshold=0.95, n_iters=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert set(zip(out["a"], out["b"])) == {(i, i + 1000) for i in range(5)}
    assert (out["cosine"] >= 0.999999).all()


def test_semdedup_empty_on_random(ray_session):
    rng = np.random.default_rng(5)
    mat = rng.standard_normal((50, 16))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(50, dtype=np.int64), pa.int64()),
            "embedding": pa.array([r for r in mat], pa.list_(pa.float64())),
        }
    )
    out = clustering.semdedup_pairs(
        ray.data.from_arrow(tbl), k=4, threshold=0.95, n_iters=3
    ).to_pandas()
    assert len(out) == 0
    # (empty-Dataset to_pandas drops column metadata — the driver queries
    # normalize with _typed_empty, same as embedding_near_dup)


def test_matrix_list_column_roundtrip():
    """matrix_to_list_column must invert _batch_matrix zero-copy (the
    unified vector codec for clustering/PQ/dedup — VERDICT r3 #4)."""
    import numpy as np
    import pyarrow as pa

    from nadry_search_engine_be_ray.stages.similarity import (
        _batch_matrix,
        matrix_to_list_column,
    )

    mat = np.arange(12, dtype=np.float64).reshape(4, 3) / 7.0
    col = matrix_to_list_column(mat, pa.float64())
    assert col.type == pa.list_(pa.float64())
    t = pa.table({"v": col})
    back = _batch_matrix(t, "v")
    assert np.array_equal(back, mat)
    # non-contiguous input (sliced) still encodes correctly
    sl = mat[::2]
    back2 = _batch_matrix(pa.table({"v": matrix_to_list_column(sl)}), "v")
    assert np.array_equal(back2, sl)
    # int dtype path (PQ codes)
    codes = np.array([[1, 2], [3, 4]], dtype=np.int64)
    backi = _batch_matrix(
        pa.table({"v": matrix_to_list_column(codes, pa.int64())}),
        "v", dtype=np.int64,
    )
    assert np.array_equal(backi, codes)

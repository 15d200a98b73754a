"""Sampling / splitting / sharding ops (golden + invariant tests; SQL
conformance for the driver queries lives in test_entry_contract)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray

from nadry_search_engine_be_ray.stages import sampling


def _docs(n=200, langs=("en", "de", "fr")):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "lang": pa.array([langs[i % len(langs)] for i in range(n)]),
                "source": pa.array([f"s{i % 5}" for i in range(n)]),
            }
        )
    )


def test_sha_bucket_matches_hashlib():
    b = sampling.sha_bucket([0, 1, 12345], "split-v1")
    for i, v in zip([0, 1, 12345], b):
        assert v == int(
            hashlib.sha256(f"split-v1:{i}".encode()).hexdigest()[:8], 16
        )


def test_split_thresholds_reject_bad_sum():
    with pytest.raises(ValueError):
        sampling.split_thresholds([("a", 0.5), ("b", 0.4)])


def test_assign_splits_partition_and_determinism(ray_session):
    ds = _docs(400)
    out = sampling.assign_splits(ds).to_pandas().sort_values("doc_id")
    # exactly one split per row; ratios roughly honored
    assert set(out["split"]) <= {"train", "val", "test"}
    frac_train = (out["split"] == "train").mean()
    assert 0.8 < frac_train < 0.97
    # deterministic under re-partitioning
    out2 = (
        sampling.assign_splits(_docs(400).repartition(7))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["split"]) == list(out2["split"])
    # bucket column equals the hash primitive
    assert list(out["bucket"][:5]) == list(
        sampling.sha_bucket([0, 1, 2, 3, 4], "split-v1")
    )


def test_stratified_sample_fractions(ray_session):
    ds = _docs(300)
    out = sampling.stratified_sample(
        ds, "lang", {"en": 1.0, "de": 0.0}, default_frac=0.5
    ).to_pandas()
    by = out.groupby("lang").size().to_dict()
    assert by.get("en", 0) == 100  # keep all
    assert "de" not in by  # drop all
    fr = by.get("fr", 0)
    assert 20 < fr < 80  # ~50 %
    # survivors are exactly the rows whose bucket clears the threshold
    thr = int(round(0.5 * (1 << 32)))
    fr_rows = out[out.lang == "fr"]
    assert (fr_rows["bucket"] < thr).all()


def test_cap_per_key_uniform(ray_session):
    ds = _docs(100).repartition(6)
    out = sampling.cap_per_key(ds, "source", 3).to_pandas()
    sizes = out.groupby("source").size()
    assert (sizes == 3).all()
    # first-by-doc_id semantics: s0 holds ids 0,5,10,...
    s0 = sorted(out[out.source == "s0"]["doc_id"])
    assert s0 == [0, 5, 10]


def test_cap_per_key_dict_quota_and_default(ray_session):
    ds = _docs(100)
    out = sampling.cap_per_key(
        ds, "source", {"s0": 2, "s1": 5}, default_cap=1
    ).to_pandas()
    sizes = out.groupby("source").size().to_dict()
    assert sizes == {"s0": 2, "s1": 5, "s2": 1, "s3": 1, "s4": 1}


def test_quota_sample_hash_order(ray_session):
    ds = _docs(100)
    out = sampling.quota_sample(
        ds, "source", {"s0": 4, "s1": 4}, default_quota=0
    ).to_pandas()
    assert set(out["source"]) == {"s0", "s1"}
    assert out.groupby("source").size().to_dict() == {"s0": 4, "s1": 4}
    # chosen = the 4 smallest buckets among that source's rows
    ids0 = [i for i in range(100) if i % 5 == 0]
    b = sampling.sha_bucket(ids0, "quota-v1")
    want = set(np.array(ids0)[np.argsort(b, kind="stable")][:4].tolist())
    assert set(out[out.source == "s0"]["doc_id"]) == want


def test_shuffle_shards_permutation(ray_session):
    ds = _docs(120).repartition(5)
    out = (
        sampling.shuffle_shards(ds, n_shards=4, keep_cols=["lang"])
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    # a permutation: every doc exactly once
    assert sorted(out["doc_id"]) == list(range(120))
    # pos is dense 0..n-1 within each shard, ordered by (bucket, doc_id)
    for s, g in out.groupby("shard"):
        assert list(g["pos"]) == list(range(len(g)))
        assert list(g["bucket"]) == sorted(g["bucket"])
        assert (g["bucket"] % 4 == s).all()
    # deterministic under re-partitioning
    out2 = (
        sampling.shuffle_shards(_docs(120), n_shards=4, keep_cols=["lang"])
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == list(out2["doc_id"])


def test_temperature_mix_flattens_distribution(ray_session):
    """alpha=0.5 mixing: target counts proportional to sqrt(n) — the
    majority key's share shrinks vs proportional, minority keys grow;
    selection is the salted-hash head per key."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from nadry_search_engine_be_ray.stages.sampling import (
        sha_bucket,
        temperature_mix,
    )

    rows = {"doc_id": list(range(130)),
            "lang": ["en"] * 100 + ["fr"] * 20 + ["de"] * 10}
    ds = ray.data.from_arrow(pa.table(rows))
    out = temperature_mix(ds, total=60, key="lang",
                          salt="mix-v1").to_pandas()
    got = out.groupby("lang").size().to_dict()
    w = np.sqrt(np.array([100, 20, 10], dtype=np.float64))
    exp = np.floor(60 * w / w.sum()).astype(int)
    assert got == {"en": exp[0], "fr": exp[1], "de": exp[2]}
    # majority share < proportional share
    assert got["en"] / sum(got.values()) < 100 / 130
    # selection = smallest salted buckets per key
    en = out[out["lang"] == "en"]
    all_en = [i for i in range(100)]
    b = sha_bucket(all_en, "mix-v1")
    order = np.lexsort((np.array(all_en), b))
    expect_ids = sorted(np.array(all_en)[order][: got["en"]].tolist())
    assert sorted(en["doc_id"].tolist()) == expect_ids

"""Bloom-filter semi join (stages/bloom.py): no false negatives ever,
exact output after verify, SQL-parity hash arithmetic."""

import numpy as np
import pyarrow as pa
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

from nadry_search_engine_be_ray.stages.bloom import (
    _bloom_bit_indexes,
    bloom_build,
    bloom_contains,
    bloom_filter_ds,
    bloom_semi_join,
)


@given(
    st.lists(st.integers(min_value=0, max_value=1 << 62), max_size=60),
    st.lists(st.integers(min_value=0, max_value=1 << 62), max_size=60),
)
@settings(max_examples=50, deadline=None)
def test_no_false_negatives(build, probe):
    """A member key can NEVER be rejected (the contract that makes
    prefilter+verify exact)."""
    m, k = 1 << 10, 3
    bitmap = np.zeros(m, dtype=bool)
    bkeys = np.asarray(build, dtype=np.int64)
    if bkeys.size:
        bitmap[np.unique(_bloom_bit_indexes(bkeys, k, m))] = True
    members = np.asarray([x for x in probe if x in set(build)], np.int64)
    assert bloom_contains(members, bitmap, k).all()
    # empty bitmap rejects everything
    got = bloom_contains(np.asarray(probe, np.int64), np.zeros(m, bool), k)
    assert not got.any() or len(probe) == 0


def test_bit_indexes_match_documented_formula():
    """The closed-form arithmetic the DuckDB oracle replicates."""
    p = (1 << 31) - 1
    keys = np.array([0, 1, 123456789, (1 << 62) - 5], dtype=np.int64)
    got = _bloom_bit_indexes(keys, 2, 4096)
    for i in (1, 2):
        a = (1103515245 * i + 12345) % p
        b = (i * 2654435761) % p
        for j, key in enumerate(keys.tolist()):
            exp = ((a * (abs(key) % p) + b) % p) % 4096
            assert got[i - 1, j] == exp


def test_semi_join_exact_and_prefilter_superset(ray_session):
    left = ray.data.from_arrow(
        pa.table({"key": pa.array(range(0, 200), pa.int64()),
                  "val": pa.array(range(1000, 1200), pa.int64())})
    ).repartition(3)
    right = ray.data.from_arrow(
        pa.table({"rkey": pa.array(range(0, 200, 3), pa.int64())})
    ).repartition(2)
    joined, stats = bloom_semi_join(
        left, right, "key", "rkey", m=256, k=2  # tiny m -> FPs likely
    )
    out = joined.to_pandas().sort_values("key").reset_index(drop=True)
    exp = sorted(range(0, 200, 3))
    assert out["key"].tolist() == exp          # exact despite FPs
    assert out["val"].tolist() == [k + 1000 for k in exp]  # rows intact
    assert stats["n_right_keys"] == len(exp)
    # prefilter alone is a SUPERSET of the members
    bitmap = bloom_build(right, "rkey", m=256, k=2)
    cand = bloom_filter_ds(
        left, "key", ray.put(bitmap), 2
    ).to_pandas()["key"].tolist()
    assert set(exp) <= set(cand)


def test_semi_join_empty_build_side(ray_session):
    left = ray.data.from_arrow(
        pa.table({"key": pa.array([1, 2, 3], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"rkey": pa.array([], pa.int64())})
    )
    joined, stats = bloom_semi_join(left, right, "key", "rkey", m=64, k=2)
    assert joined.count() == 0
    assert stats["n_set_bits"] == 0 and stats["n_right_keys"] == 0

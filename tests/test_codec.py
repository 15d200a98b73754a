"""Round-trip property tests for the posting-list codec (SURVEY.md §7.1.3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from nadry_search_engine_be_ray.functions import codec


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.decode_varints(codec.encode_varints(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=2**63), max_size=300))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    arr = np.array(sorted(vals), dtype=np.uint64)
    assert np.array_equal(
        codec.decode_sorted_deltas(codec.encode_sorted_deltas(arr)), arr
    )


def test_varint_boundaries():
    edge = np.array(
        [0, 1, 127, 128, 16383, 16384, 2**32 - 1, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(codec.decode_varints(codec.encode_varints(edge)), edge)


def test_small_values_one_byte():
    arr = np.arange(128, dtype=np.uint64)
    assert len(codec.encode_varints(arr)) == 128


def test_block_max_dominates_members():
    rng = np.random.default_rng(7)
    w = rng.random(1000) * 5
    bm = codec.block_max(w, block_size=128)
    assert bm.size == 8
    for i in range(8):
        blk = w[i * 128 : (i + 1) * 128]
        assert bm[i] >= blk.max()
        assert bm[i] == blk.max()


def test_positions_roundtrip():
    docs = [
        [(0, np.array([0, 1, 5])), (2, np.array([3]))],
        [(1, np.array([2, 7, 8, 9]))],
        [],
        [(0, np.array([0])), (1, np.array([1])), (2, np.array([0, 10]))],
    ]
    buf = codec.encode_positions(docs)
    back = codec.decode_positions(buf, len(docs))
    assert len(back) == 4
    assert np.array_equal(back[0][0], [0, 1, 5])
    assert np.array_equal(back[0][2], [3])
    assert 1 not in back[0]
    assert np.array_equal(back[1][1], [2, 7, 8, 9])
    assert back[2] == {}
    assert np.array_equal(back[3][2], [0, 10])


def test_f64_roundtrip():
    w = np.array([0.0, 1.5, 3.0, 1e-300, 1e300])
    assert np.array_equal(codec.decode_f64(codec.encode_f64(w)), w)

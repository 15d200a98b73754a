"""Broadcast-join probe guards (ADVICE r3: empty build side raised
IndexError in the searchsorted+clamp idiom)."""

import numpy as np

from nadry_search_engine_be_ray.pipelines.relational import _sorted_lookup


def test_sorted_lookup_empty_build_side():
    ks = np.array([], dtype=np.int64)
    vals = np.array([1, 2, 3], dtype=np.int64)
    hit, idx = _sorted_lookup(ks, vals)
    assert hit.tolist() == [False, False, False]
    assert idx.tolist() == [0, 0, 0]


def test_sorted_lookup_hits_and_misses():
    ks = np.array([2, 5, 9], dtype=np.int64)
    vals = np.array([1, 2, 5, 9, 10], dtype=np.int64)
    hit, idx = _sorted_lookup(ks, vals)
    assert hit.tolist() == [False, True, True, True, False]
    # matched indexes point at the right key
    assert ks[idx[hit]].tolist() == [2, 5, 9]


def test_sorted_lookup_empty_probe():
    ks = np.array([1], dtype=np.int64)
    vals = np.array([], dtype=np.int64)
    hit, idx = _sorted_lookup(ks, vals)
    assert hit.size == 0 and idx.size == 0

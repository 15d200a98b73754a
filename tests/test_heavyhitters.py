"""Sketch-family guarantees: CM never undercounts, space-saving retains
every item above n/capacity, and the exact two-pass heavy-hitter plan
equals a brute-force count."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from nadry_search_engine_be_ray.stages.heavyhitters import (
    CountMinSketch,
    SpaceSavingTopK,
    approx_top_grams,
    heavy_hitter_grams,
    simple_grams,
)

SF = "/root/testdata/sf0.001"


def _zipf_stream(n_items=200, n_draws=5000, seed=7):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, n_items + 1)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    draws = rng.choice(n_items, size=n_draws, p=p)
    return Counter(f"item{int(d):03d}" for d in draws)


def test_cms_never_undercounts():
    truth = _zipf_stream()
    cms = CountMinSketch()
    cms.add_counter(truth)
    grams = sorted(truth)
    est = cms.estimate(grams)
    true_counts = np.array([truth[g] for g in grams])
    assert (est >= true_counts).all()
    # with 4x8192 counters and ~5k adds the overcount should be tiny
    assert (est == true_counts).mean() > 0.95


def test_cms_merge_equals_single_sketch():
    t1, t2 = _zipf_stream(seed=1), _zipf_stream(seed=2)
    a, b, whole = CountMinSketch(), CountMinSketch(), CountMinSketch()
    a.add_counter(t1)
    b.add_counter(t2)
    whole.add_counter(t1 + t2)
    a.merge_bytes(b.to_bytes())
    assert (a.counts == whole.counts).all()


def test_space_saving_guarantee():
    truth = _zipf_stream(n_draws=8000)
    n = sum(truth.values())
    cap = 64
    ss = SpaceSavingTopK(cap)
    for item, c in truth.items():
        ss.add(item, c)
    kept = set(ss.counters)
    for item, c in truth.items():
        if c > n / cap:
            assert item in kept, (item, c, n / cap)
    # counters never undercount
    for item, c in ss.counters.items():
        assert c >= truth.get(item, 0)


def test_space_saving_merge_keeps_heavy_items():
    t1, t2 = _zipf_stream(seed=3), _zipf_stream(seed=4)
    total = t1 + t2
    n = sum(total.values())
    cap = 64
    a, b = SpaceSavingTopK(cap), SpaceSavingTopK(cap)
    for i, c in t1.items():
        a.add(i, c)
    for i, c in t2.items():
        b.add(i, c)
    a.merge(b)
    for item, c in total.items():
        if c > 2 * n / cap:  # merged error bound doubles
            assert item in a.counters


def test_simple_grams_edges():
    assert simple_grams("") == []
    assert simple_grams("a b c") == []  # all tokens under len 2
    assert simple_grams("foo bar baz") == ["foo bar", "bar baz"]
    assert simple_grams("Foo,BAR!baz") == ["foo bar", "bar baz"]


def test_heavy_hitters_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    truth = Counter()
    for t in texts:
        truth.update(simple_grams(t))
    thresh = 30
    expect = pd.DataFrame(
        sorted((g, c) for g, c in truth.items() if c >= thresh),
        columns=["gram", "cnt"],
    )
    got = heavy_hitter_grams(SF, threshold=thresh)
    assert got["gram"].tolist() == expect["gram"].tolist()
    assert got["cnt"].tolist() == expect["cnt"].tolist()


def test_approx_top_grams_exact_regime(ray_session):
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    truth = Counter()
    for t in texts:
        truth.update(simple_grams(t))
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = approx_top_grams(SF, k=10)
    assert list(zip(got["gram"], got["cnt"])) == [
        (g, c) for g, c in expect
    ]


def test_space_saving_eviction_flag():
    """ADVICE r3: leaving the exact regime (any eviction) must be
    detectable — counters flag evictions; under capacity they stay 0."""
    from nadry_search_engine_be_ray.stages.heavyhitters import SpaceSavingTopK

    ss = SpaceSavingTopK(capacity=2)
    ss.add("a", 5)
    ss.add("b", 3)
    assert ss.evictions == 0
    ss.add("c", 1)  # evicts the min counter
    assert ss.evictions == 1
    assert "c" in ss.counters and ss.counters["c"] == 4  # floor-inherited


def test_approx_top_grams_warns_when_capacity_exceeded(ray_session, capsys):
    got = approx_top_grams(SF, k=5, capacity=3)
    out = capsys.readouterr().out
    assert "approximate" in out
    assert len(got) == 3  # capped at capacity

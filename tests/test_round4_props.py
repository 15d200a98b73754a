"""Hypothesis property tests for the round-4 pure helpers: coarse-bin
monotonicity, u64 gram hashing vs the string path, guarded broadcast
probe, and fused-partition sizing."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from nadry_search_engine_be_ray.pipelines.relational import _sorted_lookup
from nadry_search_engine_be_ray.stages import partitioning
from nadry_search_engine_be_ray.stages.dedup import _ngram_hashes_u64
from nadry_search_engine_be_ray.stages.lm import (
    _ppl_coarse_bin,
    exploded_tokens,
    ngram_strings,
)


@given(
    st.lists(
        st.floats(
            min_value=0.0, max_value=1e30, allow_nan=False,
            allow_infinity=False,
        ),
        min_size=2, max_size=200,
    )
)
@settings(max_examples=60, deadline=None)
def test_ppl_coarse_bin_monotone_on_sorted(vals):
    """For ANY nonnegative perplexities: sorted values -> nondecreasing
    bins, bins in range, equal values -> equal bins (the invariants the
    O(bins) base-rank cumsum needs)."""
    v = np.sort(np.asarray(vals, dtype=np.float64))
    bins = _ppl_coarse_bin(v, 4096)
    assert (np.diff(bins) >= 0).all()
    assert bins.min() >= 0 and bins.max() < 4096
    same = v[1:] == v[:-1]
    assert (bins[1:][same] == bins[:-1][same]).all()


@given(
    st.lists(
        st.text(alphabet="abcxyz 0_", min_size=0, max_size=40),
        min_size=1, max_size=8,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_u64_gram_hash_tracks_string_grams(texts, n):
    """The u64 rolling hash must produce one hash per string-path gram at
    the same start position, with equal grams -> equal hashes."""
    doc_pos, flat, _ = exploded_tokens(pa.array(texts, pa.string()))
    grams, starts_s = ngram_strings(doc_pos, flat, n)
    hashes, starts_h = _ngram_hashes_u64(doc_pos, flat, n)
    assert starts_h.tolist() == list(np.asarray(starts_s).tolist())
    gl = grams.to_pylist() if hasattr(grams, "to_pylist") else list(grams)
    assert len(hashes) == len(gl)
    seen: dict[str, int] = {}
    for g, h in zip(gl, hashes.tolist()):
        if g in seen:
            assert seen[g] == h  # equal grams hash equal
        seen[g] = h


@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), max_size=50),
    st.lists(st.integers(min_value=-1000, max_value=1000), max_size=50),
)
@settings(max_examples=80, deadline=None)
def test_sorted_lookup_equals_naive_membership(build, probe):
    ks = np.unique(np.asarray(build, dtype=np.int64))
    vals = np.asarray(probe, dtype=np.int64)
    hit, idx = _sorted_lookup(ks, vals)
    naive = np.isin(vals, ks)
    assert hit.tolist() == naive.tolist()
    if ks.size:
        assert (ks[idx[hit]] == vals[hit]).all()


@given(st.integers(min_value=0, max_value=1 << 55))
@settings(max_examples=60, deadline=None)
def test_fused_parts_bounded_and_monotone(nbytes):
    p = partitioning.fused_parts(bytes_hint=nbytes)
    assert partitioning.DEFAULT_PARTS <= p <= partitioning.MAX_PARTS
    # monotone in the footprint
    p2 = partitioning.fused_parts(bytes_hint=nbytes * 2)
    assert p2 >= p


def test_proximity_composite_key_counting_property():
    """The composite-key searchsorted window count used by proximity_pairs
    must equal the brute double loop for arbitrary (doc, field, pos) sets
    (ordered and unordered modes)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    trip = st.tuples(st.integers(0, 5), st.integers(0, 2),
                     st.integers(0, 60))

    @settings(max_examples=80, deadline=None)
    @given(st.sets(trip, max_size=40), st.sets(trip, max_size=40),
           st.integers(0, 5), st.booleans())
    def _prop(aset, bset, window, ordered):
        n_docs = 6

        def flat(s):
            rows = sorted(s)  # (doc, field, pos) — field-major like the
            rows = sorted(rows, key=lambda r: (r[1], r[0], r[2]))
            d = np.array([r[0] for r in rows], dtype=np.int64)
            f = np.array([r[1] for r in rows], dtype=np.int64)
            p = np.array([r[2] for r in rows], dtype=np.int64)
            key = ((f * n_docs + d) << np.int64(33)) | p
            return key, d

        ka, da = flat(aset)
        kb, _ = flat(bset)
        if ka.size and kb.size:
            lo = ka + 1 if ordered else ka - window
            counts = (np.searchsorted(kb, ka + window, side="right")
                      - np.searchsorted(kb, lo, side="left"))
            got = np.bincount(da, weights=counts,
                              minlength=n_docs).astype(np.int64)
        else:
            got = np.zeros(n_docs, dtype=np.int64)
        exp = np.zeros(n_docs, dtype=np.int64)
        for d1, f1, p1 in aset:
            for d2, f2, p2 in bset:
                if d1 == d2 and f1 == f2:
                    ok = (1 <= p2 - p1 <= window) if ordered \
                        else abs(p1 - p2) <= window
                    if ok:
                        exp[d1] += 1
        assert np.array_equal(got, exp)

    _prop()


@given(
    st.text(alphabet="abcdef", min_size=0, max_size=10),
    st.lists(st.text(alphabet="abcdefg", min_size=0, max_size=12),
             min_size=1, max_size=30),
)
@settings(max_examples=80, deadline=None)
def test_levenshtein_vec_matches_scalar_dp(word, cands):
    """The m-wide vectorized byte DP must equal the scalar Wagner-Fischer
    on arbitrary strings (session-4 spell_correct kernel)."""
    from nadry_search_engine_be_ray.pipelines.query import _levenshtein_vec

    def lev(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    wb = word.encode()
    cb = [c.encode() for c in cands]
    L = max(1, max(len(b) for b in cb))
    mat = np.zeros((len(cb), L), dtype=np.uint8)
    for r, b in enumerate(cb):
        mat[r, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    lens = np.array([len(b) for b in cb], dtype=np.int64)
    got = _levenshtein_vec(wb, mat, lens)
    assert got.tolist() == [lev(wb, b) for b in cb]


_expr = st.deferred(
    lambda: st.one_of(
        st.sampled_from(["t0", "t1", "t2"]),
        st.tuples(st.just("not"), _expr).map(lambda t: ("not", t[1])),
        st.tuples(st.just("and"), _expr, _expr),
        st.tuples(st.just("or"), _expr, _expr),
    )
)


@given(
    st.dictionaries(st.sampled_from(["t0", "t1", "t2"]),
                    st.sets(st.integers(0, 30)),
                    min_size=3, max_size=3),
    _expr,
)
@settings(max_examples=80, deadline=None)
def test_bool_eval_matches_set_algebra(postings, expr):
    """_bool_eval's sorted-array set ops must equal Python set algebra on
    arbitrary expression trees (session-4 boolean_search kernel)."""
    from nadry_search_engine_be_ray.pipelines.query import _bool_eval

    universe = np.arange(31, dtype=np.int64)

    class _FakeReader:
        def postings(self, t):
            docs = np.array(sorted(postings[t]), dtype=np.int64)

            class _PL:
                pass

            pl = _PL()
            pl.docs = docs
            return pl if docs.size else None

    def pyeval(node):
        if isinstance(node, str):
            return postings[node]
        op, *kids = node
        if op == "not":
            return set(range(31)) - pyeval(kids[0])
        parts = [pyeval(k) for k in kids]
        return (parts[0] & parts[1] if op == "and"
                else parts[0] | parts[1])

    got = _bool_eval(expr, _FakeReader(), universe)
    assert set(got.tolist()) == pyeval(expr)
    assert np.all(np.diff(got) > 0)  # sorted unique output invariant


@given(
    st.text(alphabet="abcdef", min_size=1, max_size=10),
    st.text(alphabet="abcdef", min_size=1, max_size=10),
)
@settings(max_examples=300, deadline=None)
def test_kgram_count_filter_is_sound(w, t):
    """The spell_correct_kgram pruning bound on arbitrary strings: if
    ed(w, t) <= d then the DISTINCT boundary-marked k-gram overlap is at
    least |set(G(w))| - k*d — one edit rewrites the content of at most k
    windows, so at most k distinct grams of w can lose their last
    occurrence per edit.  A violation would mean the gram filter can
    prune a true candidate."""
    from nadry_search_engine_be_ray.pipelines.build import kgram_of

    def _lev_ref(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    k = 3
    d = _lev_ref(w.encode(), t.encode())
    gw, gt = set(kgram_of(w, k)), set(kgram_of(t, k))
    assert len(gw & gt) >= len(gw) - k * d

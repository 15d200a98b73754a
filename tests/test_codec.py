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


# ---------------------------------------------------------------------------
# frame-of-reference bit packing (posting_codec_sizes' codec)
# ---------------------------------------------------------------------------


def test_bitpack_roundtrip_sizes_and_boundaries():
    rng = np.random.default_rng(11)
    for n in [0, 1, 2, 127, 128, 129, 255, 256, 1000, 4096]:
        for hi in [2, 1 << 8, 1 << 20, 1 << 40, 1 << 63]:
            v = rng.integers(0, hi, size=n).astype(np.uint64)
            enc = codec.encode_bitpack(v)
            assert len(enc) == codec.bitpack_nbytes(v)
            assert np.array_equal(codec.decode_bitpack(enc), v)


def test_bitpack_zero_and_mixed_width_blocks():
    z = np.zeros(300, dtype=np.uint64)
    assert np.array_equal(codec.decode_bitpack(codec.encode_bitpack(z)), z)
    # varint(128) count = 2 bytes + zero-width block header byte, 0 payload
    assert codec.bitpack_nbytes(np.zeros(128, dtype=np.uint64)) == 2 + 1
    v = np.concatenate([
        np.zeros(128, dtype=np.uint64),
        np.full(128, 2**60, dtype=np.uint64),
        np.arange(50, dtype=np.uint64),
    ])
    assert np.array_equal(codec.decode_bitpack(codec.encode_bitpack(v)), v)


def test_bitpack_sorted_delta_variant():
    rng = np.random.default_rng(12)
    docs = np.unique(rng.integers(0, 1 << 30, size=5000).astype(np.uint64))
    enc = codec.encode_sorted_bitpack(docs)
    assert np.array_equal(codec.decode_sorted_bitpack(enc), docs)
    # delta-gap packing of sorted ids beats packing the absolutes
    assert len(enc) < len(codec.encode_bitpack(docs))


def test_bitpack_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                 min_size=0, max_size=400)
    )
    def _prop(xs):
        v = np.array(xs, dtype=np.uint64)
        enc = codec.encode_bitpack(v)
        assert len(enc) == codec.bitpack_nbytes(v)
        assert np.array_equal(codec.decode_bitpack(enc), v)

    _prop()


def test_ef_roundtrip_boundaries():
    """Elias-Fano: edge shapes — empty, singletons (incl. 0 and the 63-bit
    max), duplicates (non-decreasing is allowed), dense 0..n-1 (l = 0) and
    sparse streams — must round-trip, and the analytic size must equal the
    encoder's output length in every case."""
    cases = [
        np.array([], dtype=np.uint64),
        np.array([0], dtype=np.uint64),
        np.array([1 << 62], dtype=np.uint64),
        np.array([0, 0, 0], dtype=np.uint64),
        np.array([7, 7, 9, 9, 9, 10], dtype=np.uint64),
        np.arange(1000, dtype=np.uint64),              # u < n -> l = 0
        np.arange(1000, dtype=np.uint64) * 100 + 3,
        np.array([0, (1 << 62) - 1, 1 << 62], dtype=np.uint64),
    ]
    for v in cases:
        enc = codec.encode_ef(v)
        assert len(enc) == codec.ef_nbytes(v), v[:4]
        assert np.array_equal(codec.decode_ef(enc), v), v[:4]


def test_ef_beats_varint_floor_on_dense_streams():
    """On a dense sorted id stream EF approaches 2 bits/value while varint
    pays its 1-byte floor — the reason the write-once tier exists."""
    rng = np.random.default_rng(5)
    docs = np.sort(rng.choice(1 << 20, size=200_000, replace=False)
                   ).astype(np.uint64)
    ef = len(codec.encode_ef(docs))
    varint = len(codec.encode_sorted_deltas(docs))
    assert ef < varint
    # ~ n*(2 + log2(u/n)) bits: within 20% of the EF bound here
    import math
    bound_bits = docs.size * (2 + math.log2(int(docs[-1]) / docs.size))
    assert ef * 8 < bound_bits * 1.2


def test_ef_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1),
                 min_size=0, max_size=400)
    )
    def _prop(xs):
        v = np.sort(np.array(xs, dtype=np.uint64))
        enc = codec.encode_ef(v)
        assert len(enc) == codec.ef_nbytes(v)
        assert np.array_equal(codec.decode_ef(enc), v)

    _prop()


def test_positions_flat_matches_dict_decode():
    """decode_doc_positions_flat must emit exactly the dict API's values,
    grouped by field with (doc, pos) order inside each field block."""
    rng = np.random.default_rng(21)
    docs = []
    for _ in range(200):
        fields = []
        for f in range(3):
            if rng.random() < 0.6:
                k = int(rng.integers(1, 8))
                pos = np.unique(rng.integers(0, 500, size=k)).astype(np.int64)
                fields.append((f, pos))
        docs.append(fields)
    buf, offsets = codec.encode_positions_indexed(docs)
    di = np.arange(len(docs), dtype=np.int64)[::3]  # every 3rd doc
    d, f, p = codec.decode_doc_positions_flat(buf, offsets, di)
    expected = codec.decode_doc_positions_many(buf, offsets, di)
    # rebuild the dicts from the flat triples
    got: dict[int, dict[int, list[int]]] = {}
    for dd, ff, pp in zip(d.tolist(), f.tolist(), p.tolist()):
        got.setdefault(dd, {}).setdefault(ff, []).append(pp)
    for k_rank, fields in enumerate(expected):
        gf = got.get(k_rank, {})
        assert set(gf) == set(fields), k_rank
        for ff, pos in fields.items():
            assert gf[ff] == pos.tolist(), (k_rank, ff)
    # empty selection
    d, f, p = codec.decode_doc_positions_flat(buf, offsets,
                                              np.empty(0, np.int64))
    assert d.size == f.size == p.size == 0

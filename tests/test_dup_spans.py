"""Exact-substring duplicate spans (Lee-et-al-style gram-shuffle dedup)."""

import pyarrow as pa
import ray

import numpy as np

from nadry_search_engine_be_ray.stages import dedup
from nadry_search_engine_be_ray.stages.dedup import dup_spans


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_shared_passage_spans(ray_session):
    shared = " ".join(f"s{i}" for i in range(10))
    d1 = " ".join(f"x{i}" for i in range(5)) + " " + shared + " " + \
        " ".join(f"y{i}" for i in range(5))
    d2 = " ".join(f"z{i}" for i in range(3)) + " " + shared + " " + \
        " ".join(f"w{i}" for i in range(7))
    out = (
        dup_spans(_ds([(1, d1), (2, d2)]), n=4)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    # d1: shared tokens at 5..14 -> 4-gram starts 5..11 -> span [5, 15)
    # d2: shared tokens at 3..12 -> starts 3..9 -> span [3, 13)
    assert out.to_records(index=False).tolist() == [
        (1, 5, 15, 7),
        (2, 3, 13, 7),
    ]


def test_two_islands_do_not_merge_across_gap(ray_session):
    a = " ".join(f"a{i}" for i in range(6))
    b = " ".join(f"b{i}" for i in range(6))
    gap = " ".join(f"g{i}" for i in range(12))
    d1 = a + " " + gap + " " + b
    d2 = a + " " + " ".join(f"h{i}" for i in range(12)) + " " + b
    out = (
        dup_spans(_ds([(1, d1), (2, d2)]), n=4)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    # each doc: island [0,6) (starts 0..2) and island [18,24) (starts 18..20)
    assert out.to_records(index=False).tolist() == [
        (1, 0, 6, 3),
        (1, 18, 24, 3),
        (2, 0, 6, 3),
        (2, 18, 24, 3),
    ]


def test_adjacent_windows_merge(ray_session):
    # duplicated starts exactly n apart merge (touching windows)
    shared1 = "p0 p1 p2 p3"
    shared2 = "q0 q1 q2 q3"
    d1 = shared1 + " " + shared2
    d2 = shared1 + " m0 m1 m2 " + shared2
    out = (
        dup_spans(_ds([(1, d1), (2, d2)]), n=4)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    d1_rows = out[out.doc_id == 1].to_records(index=False).tolist()
    # d1: dup starts {0, 4} -> gap == n -> single span [0, 8)
    assert d1_rows == [(1, 0, 8, 2)]


def test_no_cross_doc_duplicates(ray_session):
    out = dup_spans(
        _ds([(1, "one two three four five"), (2, "six seven eight nine ten")]),
        n=3,
    ).to_pandas()
    assert len(out) == 0


def test_within_doc_repeat_alone_is_not_flagged(ray_session):
    # the same gram twice in ONE doc is not cross-doc duplication
    d1 = "r0 r1 r2 r3 k0 r0 r1 r2 r3"
    out = dup_spans(_ds([(1, d1), (2, "u0 u1 u2 u3 u4")]), n=4).to_pandas()
    assert len(out) == 0


def test_u64_gram_repr_superset_of_str(ray_session):
    """VERDICT r3 #8: gram_repr="u64" ships 8-byte hashed grams through the
    same shuffle; collisions can only ADD dup positions, so its spans must
    cover the string path's spans (in practice: equal)."""
    import pyarrow as pa

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "x alpha beta gamma delta epsilon zeta eta theta iota kappa y",
        "totally different words one two three four five six seven eight",
        "unrelated content here nine ten eleven twelve thirteen fourteen",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)
    s = dedup.dup_spans(ds, n=8).to_pandas().sort_values(
        ["doc_id", "span_start"]).reset_index(drop=True)
    u = dedup.dup_spans(ds, n=8, gram_repr="u64").to_pandas().sort_values(
        ["doc_id", "span_start"]).reset_index(drop=True)
    assert len(s) > 0  # the planted shared 10-gram region dups
    # superset: every str-span is contained in some u64-span of its doc
    for row in s.itertuples():
        cover = u[
            (u.doc_id == row.doc_id)
            & (u.span_start <= row.span_start)
            & (u.span_end >= row.span_end)
        ]
        assert len(cover) >= 1, (row, u)
    # and on a clean corpus (no engineered collisions) they are EQUAL
    assert s.equals(u)


def test_u64_gram_hashes_deterministic_and_boundary_safe():
    """The rolling hash must not produce grams spanning doc boundaries and
    must be process-deterministic (crc32+splitmix64, no PYTHONHASHSEED)."""
    import pyarrow as pa

    flat = pa.array(["a", "b", "c", "d", "e", "f"], pa.string())
    doc_pos = np.array([0, 0, 0, 1, 1, 1], np.int64)
    h, starts = dedup._ngram_hashes_u64(doc_pos, flat, 3)
    # only positions 0 and 3 start an in-doc 3-gram
    assert starts.tolist() == [0, 3]
    h2, _ = dedup._ngram_hashes_u64(doc_pos, flat, 3)
    assert h.tolist() == h2.tolist()
    # different token windows -> different hashes
    assert h[0] != h[1]

"""Distributed BPE training (pair counting SQL-checked at the driver;
merge learning golden-tested against an independent in-test reference)."""

from collections import Counter

import pyarrow as pa
import ray

from nadry_search_engine_be_ray.stages import bpe


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


def _ref_bpe(word_counts: dict, n_merges: int):
    """Independent textbook reference (Sennrich-style, no end marker)."""
    syms = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        c = Counter()
        for w, n in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                c[(s[i], s[i + 1])] += n
        if not c:
            break
        best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        for w in syms:
            syms[w] = bpe._merge_syms(syms[w], *best)
    return merges


CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def test_pair_counts_golden(ray_session):
    out = bpe.pair_counts(_docs(["ab ab", "abc"])).to_pandas()
    got = {(r.a, r.b): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 3, ("b", "c"): 1}
    # sorted by (n desc, a, b)
    assert list(out.itertuples(index=False))[0][:2] == ("a", "b")


def test_bpe_train_matches_reference(ray_session):
    ds = _docs([" ".join(CORPUS)]).repartition(2)
    got = bpe.bpe_train(ds, n_merges=6)
    want = _ref_bpe(Counter(CORPUS), 6)
    assert got == want
    # classic first merges: ('e','s') then ('es','t')
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")


def test_bpe_train_deterministic_under_partitioning(ray_session):
    docs = [" ".join(CORPUS[i::3]) for i in range(3)]
    m1 = bpe.bpe_train(_docs(docs), n_merges=4)
    m2 = bpe.bpe_train(_docs(docs).repartition(5), n_merges=4)
    assert m1 == m2


def test_bpe_train_min_count_stops_early(ray_session):
    merges = bpe.bpe_train(_docs(["ab"]), n_merges=10, min_count=2)
    assert merges == []  # the only pair occurs once


def test_bpe_encode_applies_merges_in_rank_order(ray_session):
    ds = _docs([" ".join(CORPUS)])
    merges = bpe.bpe_train(ds, n_merges=8)
    enc = bpe.bpe_encode("newest lowest", merges)
    # 'newest' was fully merged during training after enough merges
    assert "".join(enc) == "newestlowest"
    assert "est" in enc or "newest" in enc or "est" in "".join(enc)
    # unknown chars survive as singletons
    assert bpe.bpe_encode("zq", merges[:2]) == ["z", "q"]

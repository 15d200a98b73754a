"""Stupid-Backoff n-gram LM: golden counts, brute-force scoring parity,
pruning/backoff paths, edge docs (driver SQL conformance for
ngram_lm_top / lm_perplexity lives in the sweep)."""

import math

import pyarrow as pa
import ray

from nadry_search_engine_be_ray.stages import lm

DOCS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "dogs chase the cat",
    "",
    "zebra",
]


def _docs_ds(texts=DOCS):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)


def _brute_score(texts, model):
    """Independent reference implementation of the documented rule."""
    out = []
    n_total = max(model.total, 1)
    for t in texts:
        toks = lm.doc_tokens(t)
        lp = 0.0
        for i, w in enumerate(toks):
            cu = model.uni.get(w, 0)
            s1 = (cu if cu > 0 else model.alpha) / n_total
            if i == 0:
                lp += math.log10(s1)
            else:
                v = toks[i - 1]
                cb = model.bi.get(f"{v} {w}", 0)
                cv = model.uni.get(v, 0)
                if cb > 0 and cv > 0:
                    lp += math.log10(cb / cv)
                else:
                    lp += math.log10(model.alpha * s1)
        n = len(toks)
        out.append((n, round(lp, 6),
                    round(10.0 ** (-lp / max(n, 1)), 6)))
    return out


def test_golden_counts(ray_session):
    model = lm.train_lm(_docs_ds())
    assert model.uni["the"] == 5
    assert model.uni["cat"] == 3
    assert model.uni["zebra"] == 1
    assert model.bi["the cat"] == 3
    assert model.bi["cat sat"] == 1
    assert "mat dogs" not in model.bi  # no cross-doc bigrams
    assert model.total == sum(len(lm.doc_tokens(t)) for t in DOCS)


def test_min_count_and_max_vocab_pruning(ray_session):
    model = lm.train_lm(_docs_ds(), min_count=2)
    assert "zebra" not in model.uni and "the" in model.uni
    assert "cat sat" not in model.bi and model.bi["the cat"] == 3
    # total stays the UNPRUNED corpus size
    assert model.total == sum(len(lm.doc_tokens(t)) for t in DOCS)
    capped = lm.train_lm(_docs_ds(), max_vocab=2)
    assert set(capped.uni) == {"the", "cat"}  # top-2 by (count desc, gram)


def test_score_matches_brute_force(ray_session):
    model = lm.train_lm(_docs_ds(), min_count=2)
    out = (
        lm.lm_score(_docs_ds(), model, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute_score(DOCS, model)
    for i, (n, lp, ppl) in enumerate(exp):
        assert out.loc[i, "n_tokens"] == n
        assert out.loc[i, "log10_prob"] == lp
        assert out.loc[i, "ppl"] == ppl


def test_edge_docs(ray_session):
    model = lm.train_lm(_docs_ds())
    out = (
        lm.lm_score(_docs_ds(), model, concurrency=2)
        .to_pandas()
        .set_index("doc_id")
    )
    # empty doc: zero tokens, zero log-prob, ppl exactly 1
    assert out.loc[3, "n_tokens"] == 0
    assert out.loc[3, "log10_prob"] == 0.0
    assert out.loc[3, "ppl"] == 1.0
    # single-token doc: pure unigram path
    n_total = model.total
    assert out.loc[4, "log10_prob"] == round(math.log10(1 / n_total), 6)


def test_trailing_empty_doc_in_batch(ray_session):
    """Regression: an empty doc LAST in a batch must not steal the final
    token from the previous doc's reduceat segment."""
    model = lm.train_lm(_docs_ds())
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["the cat sat", ""], pa.string()),
        }
    )
    out = lm.LMScoreBatch(model)(batch).to_pandas()
    exp = _brute_score(["the cat sat", ""], model)
    assert out.loc[0, "log10_prob"] == exp[0][1]
    assert out.loc[1, "log10_prob"] == 0.0 and out.loc[1, "ppl"] == 1.0


def test_ppl_rank_buckets(ray_session):
    """Exact global (ppl, doc_id) ranks + tercile buckets, including ties
    (shared ppl values must rank by doc_id)."""
    scores = pa.table(
        {
            "doc_id": pa.array([5, 1, 3, 2, 4, 0], pa.int64()),
            "ppl": pa.array([2.5, 1.0, 2.5, 9.0, 1.5, 2.5], pa.float64()),
        }
    )
    out = (
        lm.ppl_rank_buckets(
            ray.data.from_arrow(scores).repartition(3), n_buckets=3
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute: sort by (ppl, doc_id) -> ranks; bucket = rank * 3 // 6
    order = sorted(range(6), key=lambda i: (scores["ppl"][i].as_py(),
                                            scores["doc_id"][i].as_py()))
    exp_rank = {scores["doc_id"][i].as_py(): r for r, i in enumerate(order)}
    for doc_id, rank in exp_rank.items():
        assert out.loc[doc_id, "rank"] == rank
        assert out.loc[doc_id, "bucket"] == rank * 3 // 6
    # ties 2.5/2.5/2.5 ranked by doc_id
    assert out.loc[0, "rank"] < out.loc[3, "rank"] < out.loc[5, "rank"]


def test_ppl_buckets_end_to_end(ray_session):
    model = lm.train_lm(_docs_ds(), min_count=2)
    scores = lm.lm_score(_docs_ds(), model, concurrency=2)
    out = (
        lm.ppl_rank_buckets(scores, n_buckets=3)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert len(out) == len(DOCS)
    assert sorted(out["rank"]) == list(range(len(DOCS)))
    assert out["bucket"].min() == 0 and out["bucket"].max() == 2
    # the empty doc has ppl exactly 1.0 — the global minimum -> rank 0
    assert out.loc[0, "doc_id"] == 3


def test_oov_and_backoff_paths(ray_session):
    model = lm.train_lm(_docs_ds())
    new = ["quantum cat", "the zebra"]
    out = (
        lm.lm_score(_docs_ds(new), model, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute_score(new, model)
    for i, (n, lp, ppl) in enumerate(exp):
        assert out.loc[i, "log10_prob"] == lp
    # in-model text scores better (lower ppl) than OOV text
    known = lm.lm_score(_docs_ds(["the cat sat"]), model, concurrency=2).to_pandas()
    unk = lm.lm_score(_docs_ds(["qq ww ee"]), model, concurrency=2).to_pandas()
    assert known.loc[0, "ppl"] < unk.loc[0, "ppl"]


def test_ppl_bucket_property_random_with_ties(ray_session):
    """Property (VERDICT r4 #2): the O(bins) coarse-bin ranking equals a
    brute-force global (ppl, doc_id) sort for a random distribution with
    heavy ties, values below/above the bin range (clip bins), and equal
    values straddling a bucket boundary."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = 500
    # mixture: smooth lognormal + a big tie cluster + out-of-range extremes
    vals = np.concatenate(
        [
            np.round(10 ** rng.normal(1.5, 1.0, n - 60), 6),
            np.full(40, 123.456789),          # tie cluster spanning a boundary
            np.full(10, 0.5),                 # below bin range -> clip to bin 0
            np.full(10, 1e12),                # above range -> clip to last bin
        ]
    )
    ids = rng.permutation(n).astype(np.int64)
    scores = pa.table(
        {"doc_id": pa.array(ids), "ppl": pa.array(vals, pa.float64())}
    )
    out = (
        lm.ppl_rank_buckets(
            ray.data.from_arrow(scores).repartition(7), n_buckets=3
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    order = np.lexsort((ids, vals))
    exp_rank = np.empty(n, np.int64)
    exp_rank[order] = np.arange(n)
    exp = {int(ids[i]): int(exp_rank[i]) for i in range(n)}
    assert len(out) == n
    for row in out.itertuples():
        assert row.rank == exp[row.doc_id]
        assert row.bucket == exp[row.doc_id] * 3 // n
    # the tie cluster must be ranked contiguously by doc_id and may split
    # across buckets only at the rank boundary
    tie_ranks = sorted(
        exp[int(i)] for i, v in zip(ids, vals) if v == 123.456789
    )
    assert tie_ranks == list(range(tie_ranks[0], tie_ranks[0] + 40))


def test_ppl_coarse_bin_monotonic():
    """The coarse bin must be a monotonic function of ppl (equal values
    co-locate; bins are contiguous ranges) — the invariant the O(bins)
    base-rank cumsum relies on."""
    import numpy as np

    v = np.sort(
        np.concatenate(
            [
                10 ** np.random.default_rng(0).uniform(-2, 10, 10_000),
                [0.0, 1.0, 1e-300, 1e300, 123.456789, 123.456789],
            ]
        )
    )
    bins = lm._ppl_coarse_bin(v, 4096)
    assert (np.diff(bins) >= 0).all()
    assert bins.min() >= 0 and bins.max() <= 4095


def test_ppl_buckets_independent_of_bin_count(ray_session):
    """Output ranks/buckets must be invariant to the coarse bin count
    (bins affect partitioning only, like fused partition counts)."""
    import numpy as np

    rng = np.random.default_rng(3)
    vals = np.round(10 ** rng.normal(1.5, 1.2, 300), 6)
    ids = rng.permutation(300).astype(np.int64)
    scores = pa.table(
        {"doc_id": pa.array(ids), "ppl": pa.array(vals, pa.float64())}
    )
    outs = []
    for nb in (16, 4096):
        outs.append(
            lm.ppl_rank_buckets(
                ray.data.from_arrow(scores).repartition(5),
                n_buckets=3, n_bins=nb,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])

"""DSIR importance resampling: brute-force parity (unhashed + hashed),
selection determinism, domain-affinity sanity (driver SQL conformance for
dsir_select lives in the sweep)."""

import math

import pyarrow as pa
import ray

from nadry_search_engine_be_ray.stages import dsir

RAW = [
    "the cat sat on the mat",
    "the dog ate the bone",
    "import numpy as np",
    "def main return none",
    "the cat and the dog",
    "",
]
TARGET = ["the cat sat", "the dog and the cat sat"]


def _ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)


def _brute_weights(raw_texts, tgt_texts, alpha=0.1, n_buckets=None):
    def counts(texts):
        out = {}
        for t in texts:
            for g in dsir.doc_grams(t):
                if n_buckets is not None:
                    g = str(dsir._bucket(g, n_buckets))
                out[g] = out.get(g, 0) + 1
        return out

    raw_c, tgt_c = counts(raw_texts), counts(tgt_texts)
    v, nr, nt = len(raw_c), sum(raw_c.values()), sum(tgt_c.values())
    ws = []
    for t in raw_texts:
        grams = dsir.doc_grams(t)
        if n_buckets is not None:
            grams = [str(dsir._bucket(g, n_buckets)) for g in grams]
        w = sum(
            math.log10(tgt_c.get(g, 0) + alpha)
            - math.log10(nt + alpha * v)
            - math.log10(raw_c[g] + alpha)
            + math.log10(nr + alpha * v)
            for g in grams
        )
        ws.append(round(w, 6))
    return ws


def test_weights_match_brute_force(ray_session):
    out = (
        dsir.dsir_weights(_ds(RAW), _ds(TARGET), concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute_weights(RAW, TARGET)
    for i, w in enumerate(exp):
        assert out.loc[i, "weight"] == w
    assert out.loc[5, "n_grams"] == 0 and out.loc[5, "weight"] == 0.0


def test_hashed_variant_matches_brute_force(ray_session):
    out = (
        dsir.dsir_weights(_ds(RAW), _ds(TARGET), n_buckets=32, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute_weights(RAW, TARGET, n_buckets=32)
    for i, w in enumerate(exp):
        assert out.loc[i, "weight"] == w


def test_trailing_empty_doc_in_batch(ray_session):
    """Regression: an empty doc LAST in a batch must not steal the final
    gram from the previous doc's reduceat segment."""
    raw_c = dsir._counts(_ds(RAW), "text", None)
    tgt_c = dsir._counts(_ds(TARGET), "text", None)
    model = dsir.build_log_ratio(raw_c, tgt_c)
    batch = pa.table(
        {
            "doc_id": pa.array([4, 5], pa.int64()),
            "text": pa.array([RAW[4], ""], pa.string()),
        }
    )
    out = dsir.DsirScoreBatch(model)(batch).to_pandas()
    exp = _brute_weights(RAW, TARGET)
    assert out.loc[0, "weight"] == exp[4]
    assert out.loc[1, "weight"] == 0.0


def test_target_like_docs_rank_first(ray_session):
    sel = dsir.dsir_select(_ds(RAW), _ds(TARGET), k=3,
                           concurrency=2).to_pandas()
    # target-like doc first; zero-weight empty doc beats the strongly
    # negative code-like docs; code docs rank last
    assert list(sel["doc_id"]) == [4, 5, 0]
    assert list(sel["rank"]) == [0, 1, 2]
    assert list(sel["weight"]) == sorted(sel["weight"], reverse=True)


def test_select_k_larger_than_corpus(ray_session):
    sel = dsir.dsir_select(_ds(RAW), _ds(TARGET), k=50,
                           concurrency=2).to_pandas()
    assert len(sel) == len(RAW)
    assert list(sel["rank"]) == list(range(len(RAW)))

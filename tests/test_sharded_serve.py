"""Scatter/gather sharded serving: per-shard posting actors + gather-side
scoring must return results identical to the single-process engine."""

import math

import pytest

from nadry_search_engine_be_ray.pipelines.query import SearchEngine
from nadry_search_engine_be_ray.pipelines.serve import ShardedSearchEngine
from nadry_search_engine_be_ray.sources.corpus import reference_queries


@pytest.fixture(scope="module")
def engines(ray_session, built_index):
    return SearchEngine(built_index), ShardedSearchEngine(built_index)


def _same_results(a: dict, b: dict):
    assert a["total_results"] == b["total_results"]
    assert [r["doc_id"] for r in a["results"]] == [
        r["doc_id"] for r in b["results"]
    ]
    for ra, rb in zip(a["results"], b["results"]):
        if isinstance(ra["score"], float) and math.isnan(ra["score"]):
            assert math.isnan(rb["score"])
        else:
            assert ra["score"] == rb["score"]


def test_sharded_matches_local_reference_queries(engines):
    local, sharded = engines
    for q in reference_queries():
        _same_results(
            local.search_auto(q["query"], q["page"], q["page_size"]),
            sharded.search_auto(q["query"], q["page"], q["page_size"]),
        )


def test_sharded_matches_local_bm25_and_additive(engines):
    local, sharded = engines
    for q in ("import", "search engine", "item order arrived", "zzzznope"):
        assert local.bm25_search(q, k=10) == sharded.bm25_search(q, k=10)
        assert local.additive_search(q, k=10) == sharded.additive_search(q, k=10)


def test_sharded_missing_terms(engines):
    _, sharded = engines
    out = sharded.search("qqqqq zzzzz")
    assert out["total_results"] == 0


@pytest.fixture(scope="module")
def fresh_varint_index(ray_session, tiny_corpus_dir, tmp_path_factory):
    """A varint index with NO popularity state: the session-scoped
    built_index gets a popularity write-back from the pagerank tests when
    the full suite runs, which would skew the reference scorer (0.3 *
    popularity) against the freshly built tier indexes compared here."""
    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index

    idx = str(tmp_path_factory.mktemp("index_varint_serve"))
    build_index(tiny_corpus_dir, idx, BuildConfig(num_shards=4, salt_bits=1))
    return idx


@pytest.mark.parametrize("codec_name", ["bitpack", "ef"])
def test_whole_stream_index_serves_identically(ray_session, tiny_corpus_dir,
                                               fresh_varint_index,
                                               tmp_path_factory,
                                               codec_name):
    """End-to-end serving over a write-once segment tier (bitpack FOR
    blocks / Elias-Fano): every reference query must return results
    identical to the varint index — both through the local engine and the
    scatter/gather sharded path."""
    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index

    idx = str(tmp_path_factory.mktemp(f"index_{codec_name}_serve"))
    build_index(tiny_corpus_dir, idx,
                BuildConfig(num_shards=4, salt_bits=1, docs_codec=codec_name))
    local_v = SearchEngine(fresh_varint_index)
    local_b = SearchEngine(idx)
    sharded_b = ShardedSearchEngine(idx)
    for q in reference_queries():
        want = local_v.search_auto(q["query"], q["page"], q["page_size"])
        _same_results(want, local_b.search_auto(
            q["query"], q["page"], q["page_size"]))
        _same_results(want, sharded_b.search_auto(
            q["query"], q["page"], q["page_size"]))


def test_sharded_matches_local_new_scorers(engines):
    """bm25f / weighted multiset / search_after run unchanged over the
    scatter/gather reader (all arithmetic is inherited; the facade ships
    weights and df_total with every posting list)."""
    for q in ["search engine", "item order arrived", "national community"]:
        local, sharded = engines
        assert local.topk_taat(q, k=10, scorer="bm25f") == \
            sharded.topk_taat(q, k=10, scorer="bm25f")
        w = {"search": 1.0, "engin": 0.5, "item": 2.0}
        ld, ls = local.all_scores_weighted(w, "bm25")
        sd, ss = sharded.all_scores_weighted(w, "bm25")
        assert ld.tolist() == sd.tolist()
        assert ls.tolist() == ss.tolist()
        p1 = local.search_after(q, None, k=10, scorer="bm25")
        assert p1 == sharded.search_after(q, None, k=10, scorer="bm25")
        if len(p1) == 10:
            cur = (p1[-1][1], p1[-1][0])
            assert local.search_after(q, cur, k=10, scorer="bm25") == \
                sharded.search_after(q, cur, k=10, scorer="bm25")


def test_sharded_ships_df_total_for_deleted_index(ray_session, built_index,
                                                  tmp_path):
    """On a tombstoned index the sharded reader must keep Lucene's
    stale-df scoring identical to the local reader (df_total rides the
    scatter/gather payload)."""
    import shutil

    import numpy as np
    import pyarrow.dataset as pads

    from nadry_search_engine_be_ray.pipelines.deletes import delete_docs

    idx = str(tmp_path / "idx_del")
    shutil.copytree(built_index, idx)
    import os as _os

    di = pads.dataset(
        _os.path.join(idx, "doc_stats"), format="parquet"
    ).to_table(columns=["doc_int"])["doc_int"].to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    delete_docs(idx, np.sort(di)[::3])
    local = SearchEngine(idx)
    sharded = ShardedSearchEngine(idx)
    for q in ["search engine", "item order arrived"]:
        lh = local.bm25_search(q, k=10)
        sh = sharded.bm25_search(q, k=10)
        assert lh == sh
        pl_l = local.reader.postings("search")
        pl_s = sharded.reader.postings("search")
        assert pl_l.df_stale == pl_s.df_stale
        assert pl_l.df_stale > pl_l.df  # deletes actually masked some docs

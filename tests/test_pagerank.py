"""PageRank conformance: Ray pipeline vs the oracle transcription, including
the popularity write-back feeding the reference scorer's blend (A7/A8)."""

import math
import os

import numpy as np
import pyarrow.dataset as pads
import pytest
import ray.data

from nadry_search_engine_be_ray.config import PageRankConfig
from nadry_search_engine_be_ray.oracle import pagerank_reference
from nadry_search_engine_be_ray.pipelines.pagerank import run_pagerank
from nadry_search_engine_be_ray.pipelines.query import SearchEngine
from nadry_search_engine_be_ray.sources.corpus import make_links


@pytest.fixture(scope="module")
def edges_and_urls(built_index):
    from nadry_search_engine_be_ray.stages.prep import derive_urls

    prepped = pads.dataset(
        os.path.join(built_index, "prepped"), format="parquet"
    ).to_table(columns=["repo", "path", "commit"])
    urls = sorted(derive_urls(prepped))
    edges = make_links(urls, seed=42)
    return edges, urls


def test_distributed_pagerank_matches_driver(ray_session, built_index,
                                             edges_and_urls):
    """The object-store/raw-task variant must agree with the oracle-parity
    driver version to float tolerance (summation order differs) with
    identical node sets and rank order."""
    import numpy as np

    from nadry_search_engine_be_ray.pipelines.pagerank import (
        compute_pagerank,
        compute_pagerank_distributed,
    )

    edges_tbl, _ = edges_and_urls
    doc_ints = pads.dataset(
        os.path.join(built_index, "prepped"), format="parquet"
    ).to_table(columns=["doc_int"])["doc_int"].to_numpy(zero_copy_only=False)

    for cfg in (PageRankConfig(), PageRankConfig(as_implemented=False)):
        a = compute_pagerank(
            ray.data.from_arrow(edges_tbl), doc_ints, cfg
        ).to_pandas().sort_values("url").reset_index(drop=True)
        b = compute_pagerank_distributed(
            ray.data.from_arrow(edges_tbl), doc_ints, cfg
        ).to_pandas().sort_values("url").reset_index(drop=True)

        assert list(a["url"]) == list(b["url"])
        assert np.allclose(a["popularity"], b["popularity"],
                           rtol=1e-10, atol=1e-15)
        # rank ORDER identical under the deterministic (pop desc, url) sort
        oa = a.sort_values(["popularity", "url"], ascending=[False, True])["url"]
        ob = b.sort_values(["popularity", "url"], ascending=[False, True])["url"]
        assert list(oa) == list(ob)


def test_pagerank_matches_oracle(ray_session, built_index, edges_and_urls):
    edges_tbl, urls = edges_and_urls
    # method="driver" is the oracle-parity mode (bit-identical summation
    # order); the default distributed path agrees to 1e-10 (test above)
    result = run_pagerank(ray.data.from_arrow(edges_tbl), built_index,
                          method="driver")

    pairs = list(zip(edges_tbl["src"].to_pylist(), edges_tbl["dst"].to_pylist()))
    expected = pagerank_reference(pairs, set(urls))

    got = dict(zip(result["url"].to_pylist(), result["popularity"].to_pylist()))
    assert set(got) == set(expected)
    for u in expected:
        assert got[u] == pytest.approx(expected[u], rel=1e-12, abs=1e-15), u
    # sink node (receives, never links) and cycle nodes must be present
    assert len(got) > 10


def test_textbook_mode_differs(ray_session, built_index, edges_and_urls):
    edges_tbl, _ = edges_and_urls
    cfg = PageRankConfig(as_implemented=False)
    textbook = run_pagerank_no_write(edges_tbl, built_index, cfg)
    quirk = run_pagerank_no_write(edges_tbl, built_index, PageRankConfig())
    # the quirk must actually change some ranks (documented deviation)
    t = dict(zip(textbook["url"].to_pylist(), textbook["popularity"].to_pylist()))
    q = dict(zip(quirk["url"].to_pylist(), quirk["popularity"].to_pylist()))
    assert any(abs(t[u] - q[u]) > 1e-9 for u in t)


def run_pagerank_no_write(edges_tbl, index_dir, cfg):
    from nadry_search_engine_be_ray.pipelines.pagerank import compute_pagerank

    doc_ints = (
        pads.dataset(os.path.join(index_dir, "prepped"), format="parquet")
        .to_table(columns=["doc_int"])["doc_int"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return compute_pagerank(ray.data.from_arrow(edges_tbl), doc_ints, cfg)


def test_popularity_feeds_scoring(ray_session, built_index, edges_and_urls, oracle_index):
    # after write-back, engine search must still match the oracle when the
    # oracle gets the same popularity scores (A7 normalization + A8 blend)
    edges_tbl, urls = edges_and_urls
    pairs = list(zip(edges_tbl["src"].to_pylist(), edges_tbl["dst"].to_pylist()))
    oracle_index.set_popularity(pagerank_reference(pairs, set(urls)))

    engine = SearchEngine(built_index)  # fresh: picks up popularity/
    for q in ("item order arrived", "search engine", "nation", "import"):
        got = engine.search(q)
        exp = oracle_index.search(q)
        assert [r["doc_id"] for r in got["results"]] == [
            r["doc_id"] for r in exp["results"]
        ]
        for g, e in zip(got["results"], exp["results"]):
            if math.isnan(e["score"]):
                assert math.isnan(g["score"])
            else:
                assert g["score"] == pytest.approx(e["score"], rel=1e-12)

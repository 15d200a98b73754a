"""Incremental index merge: two half-corpus indexes merged must decode
byte-identically to one full-corpus build (general interleaving k-way merge,
pipelines/merge.py — the capability the reference lacks entirely: its build
drops the collections and restarts, indexer/Main.java:58-61)."""

import os

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from nadry_search_engine_be_ray.config import BuildConfig
from nadry_search_engine_be_ray.pipelines.build import build_index
from nadry_search_engine_be_ray.pipelines.merge import merge_indexes
from nadry_search_engine_be_ray.sources.corpus import write_corpus
from nadry_search_engine_be_ray.state.segments import SegmentReader


@pytest.fixture(scope="module")
def merged_and_full(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("idxmerge")
    full_corpus = str(tmp / "corpus_full")
    write_corpus(full_corpus, n_docs=600, seed=42)
    tbl = pads.dataset(full_corpus, format="parquet").to_table()

    half_a, half_b = str(tmp / "ca"), str(tmp / "cb")
    os.makedirs(half_a), os.makedirs(half_b)
    pq.write_table(tbl.slice(0, 300), os.path.join(half_a, "part.parquet"))
    pq.write_table(tbl.slice(300), os.path.join(half_b, "part.parquet"))

    cfg = BuildConfig(num_shards=4, salt_bits=1)
    idx_full, idx_a, idx_b = (str(tmp / n) for n in ("ifull", "ia", "ib"))
    build_index(full_corpus, idx_full, cfg)
    build_index(half_a, idx_a, cfg)
    build_index(half_b, idx_b, cfg)

    idx_m = str(tmp / "imerged")
    stats = merge_indexes([idx_a, idx_b], idx_m)
    return idx_m, idx_full, stats


def test_merged_stats_match_full(merged_and_full):
    idx_m, idx_full, stats = merged_and_full
    full = SegmentReader(idx_full).stats
    # dedup is per-build: a cross-half duplicate pair survives in the split
    # builds (each half keeps its own copy), so n_docs may exceed the full
    # build's by the number of cross-half dup pairs; everything else about
    # the merge machinery is exercised below on the common doc set.
    assert stats["n_docs"] >= full["n_docs"]
    assert stats["merged_from"] == 2


def test_merged_postings_match_full(merged_and_full):
    idx_m, idx_full, _ = merged_and_full
    rm, rf = SegmentReader(idx_m), SegmentReader(idx_full)
    assert set(rf.terms()) <= set(rm.terms())
    full_docs = None
    for term in sorted(rf.terms())[:80]:
        pf, pm = rf.postings(term), rm.postings(term)
        # merged index may contain extra docs (cross-half dup losers were
        # deduped only in the full build); restrict to the full build's docs
        keep = np.isin(pm.docs, pf.docs)
        assert pm.docs[keep].tolist() == pf.docs.tolist(), term
        assert pm.tfs[keep].tolist() == pf.tfs.tolist(), term
        assert pm.weights[keep].tolist() == pf.weights.tolist(), term
        # strictly increasing docs (delta-gap precondition) after merge
        assert np.all(np.diff(pm.docs) > 0)
        # positions identical per common doc
        idxs_m = np.flatnonzero(keep)[:5]
        for k, i_m in enumerate(idxs_m):
            i_f = int(np.searchsorted(pf.docs, pm.docs[i_m]))
            fm = pm.positions_for(int(i_m))
            ff = pf.positions_for(i_f)
            assert fm.keys() == ff.keys(), term
            for f in fm:
                assert fm[f].tolist() == ff[f].tolist(), (term, f)


def test_merge_rejects_shared_docs(ray_session, tmp_path):
    corpus = str(tmp_path / "c")
    write_corpus(corpus, n_docs=120, seed=42)
    cfg = BuildConfig(num_shards=4, salt_bits=1)
    ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(corpus, ia, cfg)
    build_index(corpus, ib, cfg)
    with pytest.raises(ValueError, match="share documents|duplicate doc_int"):
        merge_indexes([ia, ib], str(tmp_path / "im"))

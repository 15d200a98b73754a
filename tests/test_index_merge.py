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


def test_upsert_index(ray_session, tmp_path):
    """upsert_index == Lucene updateDocument: new versions (same
    (repo,path), new commit ⇒ new doc_int) replace the old ones via
    tombstone + consuming merge; genuinely new docs are added.  Oracle:
    per-term df recomputed in pandas from the raw postings dumps under
    the same delete-by-key algebra."""
    import pandas as pd
    import pyarrow as pa

    from nadry_search_engine_be_ray.pipelines.merge import upsert_index
    from nadry_search_engine_be_ray.state.deletes import load_tombstones

    corpus = str(tmp_path / "c")
    write_corpus(corpus, n_docs=360, seed=11)
    tbl = pads.dataset(corpus, format="parquet").to_table()
    base_c = str(tmp_path / "base_c")
    os.makedirs(base_c)
    pq.write_table(tbl.slice(0, 300), os.path.join(base_c, "p.parquet"))

    # delta: 40 UPDATED versions of base docs + 60 new docs
    upd = tbl.slice(0, 40)
    upd = upd.set_column(
        upd.schema.get_field_index("commit"), "commit",
        pa.array([c[::-1] for c in upd["commit"].to_pylist()], pa.string()),
    )
    upd = upd.set_column(
        upd.schema.get_field_index("content"), "content",
        pa.array([c + "\nupdated marker line xylophone"
                  for c in upd["content"].to_pylist()], pa.string()),
    )
    delta_c = str(tmp_path / "delta_c")
    os.makedirs(delta_c)
    pq.write_table(
        pa.concat_tables([upd, tbl.slice(300)]),
        os.path.join(delta_c, "p.parquet"),
    )

    cfg = BuildConfig(num_shards=4, salt_bits=1)
    base_i = str(tmp_path / "bi")
    build_index(base_c, base_i, cfg)
    out = str(tmp_path / "up")
    stats = upsert_index(base_i, delta_c, out, cfg)
    assert stats["n_replaced"] == 40
    assert stats["n_purged_on_merge"] >= 40
    # base got the logical delete; the upserted index carries none
    assert load_tombstones(base_i).size == 40
    assert load_tombstones(out).size == 0

    # pandas recompute of per-term df from the raw dumps
    def dump(d, sub, cols):
        return pads.dataset(
            os.path.join(d, sub), format="parquet"
        ).to_table(columns=cols).to_pandas()

    delta_i = out + ".delta"
    dkeys = dump(delta_i, "prepped", ["repo", "path"]).drop_duplicates()
    bprep = dump(base_i, "prepped", ["doc_int", "repo", "path"])
    dead = set(
        bprep.merge(dkeys, on=["repo", "path"])["doc_int"].astype("int64")
    )
    bp = dump(base_i, "postings", ["term", "doc_int", "field"])
    bp = bp[(bp["field"] >= 0) & ~bp["doc_int"].isin(dead)]
    dp = dump(delta_i, "postings", ["term", "doc_int", "field"])
    dp = dp[dp["field"] >= 0]
    bp, dp = bp[["term", "doc_int"]], dp[["term", "doc_int"]]
    exp = (
        pd.concat([bp, dp])
        .drop_duplicates()
        .groupby("term")["doc_int"]
        .nunique()
        .sort_index()
    )
    r = SegmentReader(out)
    got = pd.Series(
        {t: r.postings(t).df for t in r.terms() if r.postings(t).df > 0}
    ).sort_index()
    pd.testing.assert_series_equal(got, exp, check_names=False)

    # the updated content is retrievable, old versions are not
    from nadry_search_engine_be_ray.pipelines.query import SearchEngine

    eng = SearchEngine(out)
    hits = eng.search("xylophone")
    assert len(hits) > 0

"""End-to-end conformance: Ray-built segments vs the single-process oracle.

The oracle transcribes the reference's indexer semantics row-at-a-time
(SURVEY.md §5); the engine must reproduce the exact same postings —
doc sets, per-doc tf, field-boosted weights, per-field positions — through
the distributed prep → tokenize → shuffle → encode → merge path.
"""

import hashlib
import json
import os

import numpy as np
import pytest

from nadry_search_engine_be_ray.state.segments import SegmentReader


@pytest.fixture(scope="module")
def reader(built_index):
    return SegmentReader(built_index)


def _oracle_doc_int(doc_id_hex: str) -> int:
    return int(doc_id_hex[:15], 16)


def test_doc_counts_match(reader, oracle_index):
    assert reader.stats["n_docs"] == len(oracle_index.documents)
    # total_words agree globally
    oracle_tw = sum(d["total_words"] for d in oracle_index.documents.values())
    assert reader.stats["total_words"] == oracle_tw


def test_term_dictionary_matches(reader, oracle_index):
    engine_terms = set(reader.terms())
    oracle_terms = set(oracle_index.index.keys())
    assert engine_terms == oracle_terms


@pytest.mark.parametrize(
    "term",
    ["import", "return", "def", "nation", "item", "order", "arriv",
     "_email_", "src", "py", "num:42", "email:test@example.com"],
)
def test_postings_match_oracle(reader, oracle_index, term):
    oracle_postings = oracle_index.index.get(term, {})
    pl = reader.postings(term)
    if not oracle_postings:
        assert pl is None
        return
    assert pl is not None

    expected = {
        _oracle_doc_int(doc_id): p for doc_id, p in oracle_postings.items()
    }
    got_docs = pl.docs.tolist()
    assert got_docs == sorted(expected)
    # strictly increasing (delta-gap precondition) across merged salt runs
    assert all(b > a for a, b in zip(got_docs, got_docs[1:]))

    for i, di in enumerate(got_docs):
        op = expected[di]
        assert int(pl.tfs[i]) == op.frequency()
        assert pl.weights[i] == pytest.approx(op.weight, abs=0)
        got_fields = pl.positions_for(i)
        exp_fields = {f: list(v) for f, v in op.field_positions.items() if v}
        assert {f: v.tolist() for f, v in got_fields.items()} == exp_fields


def test_block_max_dominates(reader):
    pl = reader.postings("import")
    assert pl is not None and pl.df > 10
    bm = pl.block_max
    for b in range(bm.size):
        blk = pl.weights[b * 128 : (b + 1) * 128]
        assert bm[b] == blk.max()


def test_dedup_kept_min_doc_id(reader, oracle_index, built_index):
    # duplicates existed in the corpus (1 in 50 rows); the engine and oracle
    # must agree on the kept doc for every duplicated content sha
    import pyarrow.dataset as pads

    losers = pads.dataset(
        os.path.join(built_index, "dup_losers"), format="parquet"
    ).to_table()
    assert losers.num_rows > 0
    oracle_ints = {
        _oracle_doc_int(d): d for d in oracle_index.documents
    }
    for di in losers["doc_int"].to_pylist():
        assert di not in oracle_ints


def test_content_sha_invariant(built_index, tiny_corpus_dir):
    # per-row invariant (BASELINE.json input_hint): content sha256 carried
    # through the documents table equals sha256 of the raw corpus content
    import pyarrow.dataset as pads

    prepped = pads.dataset(
        os.path.join(built_index, "prepped"), format="parquet"
    ).to_table(columns=["content", "content_sha256"])
    for content, sha in zip(
        prepped["content"].to_pylist()[:100], prepped["content_sha256"].to_pylist()[:100]
    ):
        assert hashlib.sha256(content.encode()).digest() == sha


def test_build_is_resumable(built_index, tiny_corpus_dir, ray_session):
    # rerunning build_index over a completed dir must skip all phases
    import time

    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index

    t0 = time.time()
    manifest = build_index(tiny_corpus_dir, built_index, BuildConfig(num_shards=4, salt_bits=1))
    assert time.time() - t0 < 5.0  # no phase re-ran
    assert set(manifest["phases"]) >= {"prep", "losers", "postings", "segments"}
    with open(os.path.join(built_index, "stats.json")) as f:
        stats = json.load(f)
    assert stats["n_docs"] > 0


def test_uncompacted_build_matches_compacted(tiny_corpus_dir, built_index,
                                             ray_session, tmp_path):
    """compact_segments=False leaves salted runs unmerged on disk; the
    reader concatenates runs in salt order, so decoded postings must be
    IDENTICAL to the merged index."""
    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index

    idx = str(tmp_path / "uncompacted")
    build_index(
        tiny_corpus_dir, idx,
        BuildConfig(num_shards=4, salt_bits=1, compact_segments=False),
    )
    ra, rb = SegmentReader(built_index), SegmentReader(idx)
    assert set(ra.terms()) == set(rb.terms())
    for term in list(ra.terms())[:40]:
        pa_, pb_ = ra.postings(term), rb.postings(term)
        assert pa_.docs.tolist() == pb_.docs.tolist(), term
        assert pa_.tfs.tolist() == pb_.tfs.tolist(), term
        assert pa_.weights.tolist() == pb_.weights.tolist(), term
        for i in range(min(pa_.df, 5)):
            fa = pa_.positions_for(i)
            fb = pb_.positions_for(i)
            assert fa.keys() == fb.keys()
            for f in fa:
                assert fa[f].tolist() == fb[f].tolist()


def test_batched_position_decode_matches_single(built_index, ray_session):
    import numpy as np

    reader = SegmentReader(built_index)
    checked = 0
    for term in list(reader.terms()):
        pl = reader.postings(term)
        if pl.df < 3:
            continue
        idx = np.arange(pl.df)
        many = pl.positions_for_many(idx)
        for i in range(pl.df):
            single = pl.positions_for(i)
            assert single.keys() == many[i].keys()
            for f in single:
                assert single[f].tolist() == many[i][f].tolist()
        checked += 1
        if checked >= 10:
            break
    assert checked >= 5


def test_resume_after_partial_phase_crash(tiny_corpus_dir, ray_session, tmp_path):
    """A phase dir left WITHOUT its _DONE marker (crash mid-write) must be
    rebuilt from scratch, not appended to — duplicated rows would corrupt
    postings silently."""
    import shutil

    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    cfg = BuildConfig(num_shards=4, salt_bits=1)
    idx_a = str(tmp_path / "full")
    build_index(tiny_corpus_dir, idx_a, cfg)
    ref_stats = json.load(open(os.path.join(idx_a, "stats.json")))

    # simulate a crash: postings phase COMPLETE files but no marker
    idx_b = str(tmp_path / "crashed")
    build_index(tiny_corpus_dir, idx_b, cfg)
    for phase in ("postings", "segments_merged", "doc_stats"):
        os.remove(os.path.join(idx_b, phase, "_DONE"))
    os.remove(os.path.join(idx_b, "stats.json"))
    build_index(tiny_corpus_dir, idx_b, cfg)

    got_stats = json.load(open(os.path.join(idx_b, "stats.json")))
    assert got_stats["n_docs"] == ref_stats["n_docs"]
    assert got_stats["total_words"] == ref_stats["total_words"]
    assert got_stats["n_term_rows"] == ref_stats["n_term_rows"]

    ra, rb = SegmentReader(idx_a), SegmentReader(idx_b)
    assert set(ra.terms()) == set(rb.terms())
    for term in list(ra.terms())[:25]:
        pa_, pb_ = ra.postings(term), rb.postings(term)
        assert pa_.docs.tolist() == pb_.docs.tolist()
        assert pa_.tfs.tolist() == pb_.tfs.tolist()
    shutil.rmtree(idx_a, ignore_errors=True)
    shutil.rmtree(idx_b, ignore_errors=True)


def test_actor_pool_tokenize_matches_tasks(tiny_corpus_dir, built_index,
                                           ray_session, tmp_path):
    """tokenize_concurrency=N switches the tokenize stage to an actor pool
    (T1 stateful-stage mapping); output must be identical to the stateless-
    task path."""
    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index

    idx = str(tmp_path / "actor_tok")
    build_index(
        tiny_corpus_dir, idx,
        BuildConfig(num_shards=4, salt_bits=1, tokenize_concurrency=2),
    )
    ra, rb = SegmentReader(built_index), SegmentReader(idx)
    assert set(ra.terms()) == set(rb.terms())
    for term in list(ra.terms())[:30]:
        assert ra.postings(term).docs.tolist() == rb.postings(term).docs.tolist()
        assert ra.postings(term).tfs.tolist() == rb.postings(term).tfs.tolist()


def test_sort_exchange_build_is_byte_identical(tiny_corpus_dir, built_index,
                                               ray_session, tmp_path):
    """The two segment_exchange variants ("storage" staging write — the
    default built_index — vs the groupby("shard") "sort" shuffle) must
    produce byte-identical merged segment rows: same terms, same encoded
    posting/position payload bytes per term."""
    import pyarrow.dataset as pads

    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import MERGED, build_index

    idx = str(tmp_path / "sort_exchange")
    build_index(
        tiny_corpus_dir, idx,
        BuildConfig(num_shards=4, salt_bits=1, segment_exchange="sort"),
    )

    def rows(index_dir):
        t = pads.dataset(
            os.path.join(index_dir, MERGED), format="parquet",
            partitioning="hive",
        ).to_table()
        out = {}
        for r in t.sort_by([("term", "ascending")]).to_pylist():
            out[r["term"]] = (
                r["df"], r["docs"], r["tfs"], r["weights"],
                r["block_max"], r["positions"], r["pos_offsets"],
            )
        return out

    a, b = rows(built_index), rows(idx)
    assert a.keys() == b.keys()
    assert a == b


def test_posting_codec_sizes_matches_local_recompute(built_index):
    """The distributed actor-pool size scan must equal a driver-local
    recompute from the same decoded posting lists (and bitpack must win
    on the dense gap streams it is designed for)."""
    import numpy as np

    from nadry_search_engine_be_ray.functions.codec import (
        _varint_nbytes, bitpack_nbytes, ef_nbytes, encode_sorted_bitpack)
    from nadry_search_engine_be_ray.pipelines.build import posting_codec_sizes
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    out = posting_codec_sizes(built_index, concurrency=2, batch_size=64)
    r = SegmentReader(built_index)
    assert out.num_rows == len(list(r.terms()))
    got = {
        t: (d, v, b, e, tv, tb)
        for t, d, v, b, e, tv, tb in zip(
            out["term"].to_pylist(), out["df"].to_pylist(),
            out["varint_bytes"].to_pylist(), out["bitpack_bytes"].to_pylist(),
            out["ef_bytes"].to_pylist(),
            out["tfs_varint_bytes"].to_pylist(),
            out["tfs_bitpack_bytes"].to_pylist())
    }
    for t in list(r.terms())[:50]:
        pl = r.postings(t)
        docs = pl.docs.astype(np.uint64)
        tfs = pl.tfs.astype(np.uint64)
        gaps = np.diff(docs, prepend=np.uint64(0)).astype(np.uint64)
        hdr = int(_varint_nbytes(np.array([docs.size], dtype=np.uint64))[0])
        exp = (docs.size, hdr + int(_varint_nbytes(gaps).sum()),
               len(encode_sorted_bitpack(docs)),
               ef_nbytes(docs),
               hdr + int(_varint_nbytes(tfs).sum()),
               bitpack_nbytes(tfs))
        assert got[t] == exp, t

    # dense_remap: docs first mapped to their rank in the doc universe —
    # recompute the rank locally and check one term's whole row
    import os

    import pyarrow.dataset as pads

    dense = posting_codec_sizes(built_index, concurrency=2, batch_size=64,
                                dense_remap=True)
    assert dense.num_rows == out.num_rows
    universe = np.sort(pads.dataset(
        os.path.join(built_index, "doc_stats"), format="parquet"
    ).to_table(columns=["doc_int"])["doc_int"].to_numpy(
        zero_copy_only=False).astype(np.int64))
    got_d = {
        t: (v, e) for t, v, e in zip(dense["term"].to_pylist(),
                                     dense["varint_bytes"].to_pylist(),
                                     dense["ef_bytes"].to_pylist())
    }
    for t in list(r.terms())[:20]:
        docs = np.searchsorted(
            universe, r.postings(t).docs).astype(np.uint64)
        gaps = np.diff(docs, prepend=np.uint64(0)).astype(np.uint64)
        hdr = int(_varint_nbytes(
            np.array([docs.size], dtype=np.uint64))[0])
        assert got_d[t] == (hdr + int(_varint_nbytes(gaps).sum()),
                            ef_nbytes(docs)), t
    # the remap tightens gaps: aggregate streams must shrink
    assert (sum(dense["varint_bytes"].to_pylist())
            < sum(out["varint_bytes"].to_pylist()))


import pytest as _pytest


@_pytest.mark.parametrize("codec_name", ["bitpack", "ef"])
def test_whole_stream_docs_codec_build_is_query_identical(tiny_corpus_dir,
                                                          built_index,
                                                          tmp_path_factory,
                                                          codec_name):
    """A build with a write-once final-tier codec (docs_codec='bitpack' FOR
    block code, or 'ef' Elias-Fano) must serve posting lists IDENTICAL to
    the default varint build — docs, tfs, weights, block_max and positions
    all equal per term — and stats.json must record the codec so readers
    pick the right decoder."""
    import json
    import os

    import numpy as np

    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    idx = str(tmp_path_factory.mktemp(f"index_{codec_name}"))
    cfg = BuildConfig(num_shards=4, salt_bits=1, docs_codec=codec_name)
    build_index(tiny_corpus_dir, idx, cfg)
    with open(os.path.join(idx, "stats.json")) as f:
        assert json.load(f)["docs_codec"] == codec_name

    a, b = SegmentReader(built_index), SegmentReader(idx)
    terms_a, terms_b = set(a.terms()), set(b.terms())
    assert terms_a == terms_b and terms_a
    for t in sorted(terms_a):
        pa_, pb = a.postings(t), b.postings(t)
        assert np.array_equal(pa_.docs, pb.docs), t
        assert np.array_equal(pa_.tfs, pb.tfs), t
        assert np.array_equal(pa_.weights, pb.weights), t
        assert np.array_equal(pa_.block_max, pb.block_max), t
        assert pa_.positions_buf == pb.positions_buf, t
        assert np.array_equal(pa_.pos_offsets, pb.pos_offsets), t


@_pytest.mark.parametrize("codec_name", ["bitpack", "ef"])
def test_whole_stream_docs_codec_requires_compaction(tiny_corpus_dir,
                                                     tmp_path_factory,
                                                     codec_name):
    import pytest

    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index

    idx = str(tmp_path_factory.mktemp("index_badcfg"))
    cfg = BuildConfig(num_shards=2, salt_bits=1, docs_codec=codec_name,
                      compact_segments=False)
    with pytest.raises(ValueError, match="compact_segments"):
        build_index(tiny_corpus_dir, idx, cfg)


@_pytest.mark.parametrize("codec_name", ["bitpack", "ef"])
def test_merge_indexes_refuses_whole_stream_sources(tiny_corpus_dir,
                                                    tmp_path_factory,
                                                    codec_name):
    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index
    from nadry_search_engine_be_ray.pipelines.merge import merge_indexes

    ia = str(tmp_path_factory.mktemp(f"index_{codec_name}_a"))
    cfg = BuildConfig(num_shards=2, salt_bits=1, docs_codec=codec_name)
    build_index(tiny_corpus_dir, ia, cfg)
    out = str(tmp_path_factory.mktemp(f"index_{codec_name}_merged"))
    try:
        merge_indexes([ia, ia], out)
        raise AssertionError(
            f"expected merge_indexes to refuse {codec_name}")
    except AssertionError as e:
        assert "varint" in str(e)


def test_champion_lists_matches_full_sort(built_index):
    """champion_lists' per-term top-m must equal sorting the FULL decoded
    posting list by (weight desc, doc asc), and every champion weight must
    be >= the best non-champion weight (the tier-1 guarantee)."""
    import numpy as np

    from nadry_search_engine_be_ray.pipelines.build import champion_lists
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    m = 2
    out = champion_lists(built_index, m=m, concurrency=2, batch_size=64)
    r = SegmentReader(built_index)
    got: dict[str, list] = {}
    for t, d, w, k in zip(out["term"].to_pylist(),
                          out["doc_int"].to_pylist(),
                          out["weight"].to_pylist(),
                          out["w_rank"].to_pylist()):
        got.setdefault(t, []).append((k, d, w))
    assert set(got) == set(r.terms())
    for t in list(r.terms())[:60]:
        pl = r.postings(t)
        order = np.lexsort((pl.docs, -pl.weights))
        exp = [
            (i + 1, int(pl.docs[j]), float(np.round(pl.weights[j], 9)))
            for i, j in enumerate(order[:m])
        ]
        assert sorted(got[t]) == exp, t
        if pl.df > m:
            worst_champion = min(w for _, _, w in got[t])
            best_rest = float(np.max(pl.weights[order[m:]]))
            assert worst_champion >= np.round(best_rest, 9), t


def test_index_lineage_per_shard_accounting(built_index):
    """index_lineage's per-shard counts must tie out: shard rows sum to
    the total row, n_terms == dictionary size, n_postings == sum of df
    over terms, and byte footprints equal the raw payload octet lengths
    read directly from the segment parquet."""
    import os

    import pyarrow.dataset as pads

    from nadry_search_engine_be_ray.pipelines.build import index_lineage
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    out = index_lineage(built_index).to_pandas()
    assert list(out["shard"])[0] == -1
    total = out.iloc[0]
    shards = out.iloc[1:]
    for c in ["n_terms", "n_postings", "docs_bytes", "tfs_bytes",
              "weights_bytes", "positions_bytes"]:
        assert int(shards[c].sum()) == int(total[c]), c

    r = SegmentReader(built_index)
    terms = list(r.terms())
    assert int(total["n_terms"]) == len(terms)
    assert int(total["n_postings"]) == sum(
        int(r.postings(t).df) for t in terms
    )

    seg_root = os.path.join(built_index, "segments_merged")
    if not os.path.isdir(seg_root):
        seg_root = os.path.join(built_index, "segments")
    seg = pads.dataset(seg_root, format="parquet",
                       partitioning="hive").to_table(columns=["docs"])
    raw_docs_bytes = sum(len(b) for b in seg["docs"].to_pylist())
    assert int(total["docs_bytes"]) == raw_docs_bytes

"""Build resumability (north_rule: resumable from per-partition checkpoints
with lineage + metrics): phases are checkpointed by _DONE markers; a rerun
skips completed phases, redoes incomplete ones, and converges to the same
index bytes."""

import json
import os
import shutil

import pytest

from nadry_search_engine_be_ray.config import BuildConfig
from nadry_search_engine_be_ray.pipelines.build import MERGED, build_index
from nadry_search_engine_be_ray.state.segments import SegmentReader


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from nadry_search_engine_be_ray.sources.corpus import write_corpus

    d = tmp_path_factory.mktemp("resume_corpus")
    write_corpus(str(d), n_docs=200, seed=7)
    return str(d)


def _df_table(index_dir):
    r = SegmentReader(index_dir)
    return sorted((t, r.postings(t).df) for t in r.terms())


def test_resume_after_lost_phase(ray_session, corpus, tmp_path):
    cfg = BuildConfig(num_shards=2, salt_bits=1)
    full = os.path.join(tmp_path, "full")
    build_index(corpus, full, cfg)
    expect = _df_table(full)

    # simulate a crash mid-compaction: segments_merged exists without _DONE
    crashed = os.path.join(tmp_path, "crashed")
    build_index(corpus, crashed, cfg)
    merged = os.path.join(crashed, MERGED)
    os.remove(os.path.join(merged, "_DONE"))
    # leave partial files in place — _fresh() must clear them on resume
    os.remove(os.path.join(crashed, "stats.json"))

    manifest = build_index(corpus, crashed, cfg)  # resume
    assert _df_table(crashed) == expect
    # lineage + metrics recorded per phase
    assert {"prep", "losers", "postings", "segments", "stats"} <= set(
        manifest["phases"]
    )
    for ph in manifest["phases"].values():
        assert ph["seconds"] >= 0


def test_rerun_is_noop_on_complete_index(ray_session, corpus, tmp_path):
    cfg = BuildConfig(num_shards=2, salt_bits=1)
    idx = os.path.join(tmp_path, "idx")
    build_index(corpus, idx, cfg)
    stats_before = json.load(open(os.path.join(idx, "stats.json")))
    mtime = os.path.getmtime(
        os.path.join(idx, MERGED, "_DONE")
    )
    build_index(corpus, idx, cfg)  # all phases skipped
    assert os.path.getmtime(os.path.join(idx, MERGED, "_DONE")) == mtime
    assert json.load(open(os.path.join(idx, "stats.json"))) == stats_before

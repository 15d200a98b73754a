"""Multi-format ingestion: jsonl/csv/parquet all land on the canonical
(repo, path, commit, lang, content) schema with byte-identical content
(the end-to-end sha256 invariant), and the normalized output feeds the
build pipeline unchanged."""

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

from nadry_search_engine_be_ray.sources.corpus import make_corpus
from nadry_search_engine_be_ray.sources.ingest import (
    CANONICAL_COLUMNS,
    ingest_to_parquet,
    normalize_batch,
    read_corpus,
)


@pytest.fixture(scope="module")
def small_corpus():
    return make_corpus(64)


def _content_shas(table: pa.Table) -> list[str]:
    return sorted(
        hashlib.sha256(c.encode()).hexdigest()
        for c in table["content"].to_pylist()
    )


def test_jsonl_roundtrip(ray_session, tmp_path, small_corpus):
    p = tmp_path / "corpus.jsonl"
    with open(p, "w") as f:
        for row in small_corpus.to_pylist():
            f.write(json.dumps(row) + "\n")
    ds = read_corpus(str(p))
    out = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert out.column_names == CANONICAL_COLUMNS
    assert _content_shas(out) == _content_shas(small_corpus)


def test_csv_roundtrip(ray_session, tmp_path, small_corpus):
    # CSV cannot carry newlines in content unescaped; pyarrow quotes them
    p = tmp_path / "corpus.csv"
    pacsv.write_csv(small_corpus, str(p))
    ds = read_corpus(str(p))
    out = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert out.column_names == CANONICAL_COLUMNS
    assert _content_shas(out) == _content_shas(small_corpus)


def test_normalize_fills_missing_columns():
    batch = pa.table(
        {
            "repo": ["o/r"],
            "path": ["src/a.py"],
            "content": ["import os"],
            "extra": [1],
        }
    )
    out = normalize_batch(batch)
    assert out.column_names == CANONICAL_COLUMNS
    assert out["commit"][0].as_py() == ""
    assert out["lang"][0].as_py() == "python"


def test_normalize_derives_lang_only_when_empty():
    batch = pa.table(
        {
            "repo": ["o/r", "o/r"],
            "path": ["a.md", "b.md"],
            "commit": ["c1", "c2"],
            "lang": ["java", ""],
            "content": ["x", "y"],
        }
    )
    out = normalize_batch(batch)
    assert out["lang"].to_pylist() == ["java", "markdown"]


def test_normalize_rejects_missing_required():
    with pytest.raises(ValueError, match="missing required"):
        normalize_batch(pa.table({"repo": ["r"], "path": ["p"]}))


def test_ingest_to_parquet_feeds_build(ray_session, tmp_path, small_corpus):
    src = tmp_path / "dump.jsonl"
    with open(src, "w") as f:
        for row in small_corpus.to_pylist():
            row.pop("lang")  # exercise derivation
            f.write(json.dumps(row) + "\n")
    out_dir = str(tmp_path / "canon")
    ingest_to_parquet(str(src), out_dir)
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert files
    got = pq.read_table(out_dir)
    assert sorted(got.column_names) == sorted(CANONICAL_COLUMNS)
    assert _content_shas(got) == _content_shas(small_corpus)
    # idempotent: second call is a no-op (marker short-circuit)
    before = {f: os.path.getmtime(os.path.join(out_dir, f)) for f in files}
    ingest_to_parquet(str(src), out_dir)
    after = {f: os.path.getmtime(os.path.join(out_dir, f)) for f in files}
    assert before == after


def test_ingest_reingests_on_source_change(ray_session, tmp_path, small_corpus):
    """ADVICE r3: the idempotence marker must include a content
    fingerprint — changing the source file re-ingests instead of reusing
    the stale canonical parquet."""
    src = tmp_path / "dump.jsonl"
    rows = small_corpus.to_pylist()
    with open(src, "w") as f:
        for row in rows[:2]:
            f.write(json.dumps(row) + "\n")
    out_dir = str(tmp_path / "canon2")
    ingest_to_parquet(str(src), out_dir)
    assert pq.read_table(out_dir).num_rows == 2
    # append a row -> size/mtime fingerprint changes -> re-ingestion
    with open(src, "a") as f:
        f.write(json.dumps(rows[2]) + "\n")
    ingest_to_parquet(str(src), out_dir)
    assert pq.read_table(out_dir).num_rows == 3

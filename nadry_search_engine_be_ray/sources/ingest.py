"""Multi-format corpus ingestion -> the canonical input table.

The engine's canonical input is the BASELINE ``input_hint`` Parquet shape
``(repo, path, commit, lang, content)`` (all utf8).  Real corpora arrive in
other layouts too — JSONL dumps, CSV exports, bare parquet with extra or
missing columns — so this module provides one normalizing front door:

* ``read_corpus(path, format=None)`` — a lazy ``ray.data.Dataset`` in the
  canonical schema from parquet / jsonl / csv (format autodetected from the
  extension unless given).  Normalization runs as a vectorized
  ``map_batches`` stage: extra columns are dropped, a missing ``lang`` is
  derived from the path extension, a missing ``commit`` becomes "" (the
  build keys documents by content sha256, not commit), and ``repo, path,
  content`` are required (fail fast with a clear error).
* ``ingest_to_parquet(src, out_dir, ...)`` — materialize any supported
  source as canonical sharded parquet, the layout ``build_index`` consumes.
  Idempotent per (src, format) via a _meta marker, same contract as
  ``write_corpus``.

Scale notes: JSONL/CSV read + normalize are streaming block transforms (no
driver materialization); at 100 TB you would ingest once into parquet (the
column-pruned, row-group-indexed format every downstream stage assumes) and
run all pipelines off that — which is exactly what ``ingest_to_parquet``
does.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

CANONICAL_COLUMNS = ["repo", "path", "commit", "lang", "content"]
REQUIRED_COLUMNS = ["repo", "path", "content"]

_EXT_LANG = {
    "py": "python",
    "java": "java",
    "js": "javascript",
    "md": "markdown",
    "ts": "typescript",
    "go": "go",
    "rs": "rust",
    "c": "c",
    "h": "c",
    "cpp": "cpp",
    "rb": "ruby",
}


def _detect_format(path: str) -> str:
    p = path.rstrip("/")
    for fmt, exts in (
        ("parquet", (".parquet",)),
        ("jsonl", (".jsonl", ".json", ".ndjson")),
        ("csv", (".csv", ".tsv")),
    ):
        if p.endswith(exts):
            return fmt
    if os.path.isdir(p):
        for f in sorted(os.listdir(p)):
            for fmt, exts in (
                ("parquet", (".parquet",)),
                ("jsonl", (".jsonl", ".json", ".ndjson")),
                ("csv", (".csv", ".tsv")),
            ):
                if f.endswith(exts):
                    return fmt
    raise ValueError(f"cannot detect corpus format for {path!r}")


def _lang_from_path(paths: pa.ChunkedArray | pa.Array) -> pa.Array:
    exts = pc.ascii_lower(
        pc.replace_substring_regex(paths, pattern=r"^.*\.", replacement="")
    )
    py = exts.to_pylist()
    return pa.array(
        [_EXT_LANG.get(e or "", "unknown") for e in py], pa.string()
    )


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Project any input batch onto the canonical schema (vectorized)."""
    names = set(batch.column_names)
    missing = [c for c in REQUIRED_COLUMNS if c not in names]
    if missing:
        raise ValueError(
            f"corpus input is missing required column(s) {missing}; "
            f"got {sorted(names)}"
        )
    n = batch.num_rows
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for c in ("repo", "path", "content"):
        cols[c] = pc.cast(pc.fill_null(batch[c], ""), pa.string())
    cols["commit"] = (
        pc.cast(pc.fill_null(batch["commit"], ""), pa.string())
        if "commit" in names
        else pa.array([""] * n, pa.string())
    )
    if "lang" in names:
        lang = pc.cast(pc.fill_null(batch["lang"], ""), pa.string())
        if pc.any(pc.equal(lang, "")).as_py():
            derived = _lang_from_path(cols["path"])
            lang = pc.if_else(pc.equal(lang, ""), derived, lang)
        cols["lang"] = lang
    else:
        cols["lang"] = _lang_from_path(cols["path"])
    return pa.table({c: cols[c] for c in CANONICAL_COLUMNS})


def read_corpus(path: str, format: str | None = None) -> ray.data.Dataset:
    """Lazy canonical-schema corpus Dataset from parquet / jsonl / csv."""
    fmt = format or _detect_format(path)
    if fmt == "parquet":
        ds = ray.data.read_parquet(path)
    elif fmt == "jsonl":
        ds = ray.data.read_json(path)
    elif fmt == "csv":
        ds = ray.data.read_csv(path)
    else:
        raise ValueError(f"unsupported corpus format {fmt!r}")
    return ds.map_batches(normalize_batch, batch_format="pyarrow")


def ingest_to_parquet(
    src: str,
    out_dir: str,
    format: str | None = None,
) -> str:
    """Normalize any supported source into canonical sharded parquet
    (the build pipeline's input layout).  Idempotent via a _meta marker;
    stale shards from a crashed previous run are cleared first (the
    resumable-sink contract used by build/curate)."""
    fmt = format or _detect_format(src)
    marker = os.path.join(out_dir, "_meta")
    # content fingerprint (size + mtime_ns) in the tag: re-running after
    # the source file changed re-ingests instead of silently reusing the
    # stale canonical output (ADVICE r3).  Directory sources fingerprint
    # the per-file stats of their direct children.
    src_abs = os.path.abspath(src)
    if os.path.isdir(src_abs):
        st = [
            (n, os.stat(os.path.join(src_abs, n)).st_size,
             os.stat(os.path.join(src_abs, n)).st_mtime_ns)
            for n in sorted(os.listdir(src_abs))
        ]
    else:
        s = os.stat(src_abs)
        st = [(os.path.basename(src_abs), s.st_size, s.st_mtime_ns)]
    import hashlib

    fp = hashlib.sha256(repr(st).encode()).hexdigest()[:16]
    tag = f"ingest:{src_abs}:{fmt}:{fp}:v2"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == tag:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith(".parquet"):
            os.remove(os.path.join(out_dir, f))
    read_corpus(src, format=fmt).write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write(tag)
    return out_dir

"""Code-corpus curation operators: license detection, The-Stack-style
quality filters, and MOSS winnowing clone detection.

The graft payload is CODE (`BASELINE.json` `graft_cell.payload`); these are
the curation passes a training-data pipeline runs over a source-code corpus
of shape ``(repo, path, commit, lang, content)`` before indexing/training
(reference scope: Nadry indexes whatever the crawler stored —
`indexer/DatabaseManager.java` — so this widens, not ports):

* :func:`license_detect`        — per-file license classification by
  prioritized key-phrase match (the SPDX-matcher-lite rule every corpus
  pipeline applies to decide redistributability).
* :func:`stack_quality_filters` / :func:`stack_file_metrics` — the
  published The Stack / StarCoder data-quality heuristics (Kocetkov et al.
  2022): max/avg line length, alphanumeric fraction, auto-generated
  markers, and the composite keep flag.
* :func:`winnow` / :func:`winnow_stats` / :func:`clone_pairs` — local
  document fingerprinting via winnowing (Schleimer, Wilkerson & Aiken,
  SIGMOD 2003 — the MOSS algorithm): char k-grams over a normalized
  stream, window-of-w rightmost-minimum selection, then clone pairs =
  files sharing >= ``min_shared`` distinct selected hashes (hashes seen in
  more than ``max_df`` files are dropped first, the MOSS idf cut that
  keeps boilerplate from exploding the pair space).

Everything is vectorized (Arrow RE2 kernels + numpy sliding windows); the
only per-gram Python loop is the ``hash_repr="sha"`` winnowing hash, kept
because DuckDB can replay ``sha256(gram)[:8]`` byte-for-byte so the WHOLE
selection chain is driver-hash-checked.  ``hash_repr="u64"`` is the
100 TB representation — a splitmix-finalized polynomial rolling hash, k
vector ops per doc, no gram strings ever built — selection logic shared,
property-tested to the same winnowing guarantees.

Scale notes: license/quality are embarrassingly-parallel map_batches with
tiny per-(lang,keep) combines.  Winnowing emits (hash, doc) fingerprints
into the SAME fused-partition groupby shuffle the dedup family uses
(`stages/partitioning.py`); pair emission is per-hash-bucket with the
``max_df`` cut bounding bucket fan-out, and the final per-pair count is a
second bounded groupby — no all-pairs stage anywhere.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Sum

from .partitioning import fused_parts

# ---------------------------------------------------------------------------
# license detection
# ---------------------------------------------------------------------------

# prioritized (license, lowercase key phrase) rules — first match wins;
# phrases are the canonical opening clauses of each license text
LICENSE_RULES: list[tuple[str, str]] = [
    ("apache-2.0", "licensed under the apache license, version 2.0"),
    ("mit", "permission is hereby granted, free of charge"),
    ("gpl-3.0", "gnu general public license"),
    ("bsd-3-clause", "redistribution and use in source and binary forms"),
    ("mpl-2.0", "mozilla public license"),
    ("unlicense", "free and unencumbered software"),
]


def license_detect(src: ray.data.Dataset) -> pd.DataFrame:
    """Per-file license: prioritized lowercase-substring match over
    ``content``; returns only matched files (repo, path, lang, license),
    ordered.  Unmatched files are implicitly license='none' and excluded —
    the filter itself is part of the checked surface (row count)."""

    def classify(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["content"])
        masks = [
            pc.match_substring(low, phrase).to_numpy(zero_copy_only=False)
            for _, phrase in LICENSE_RULES
        ]
        lic = np.select(masks, [name for name, _ in LICENSE_RULES], "none")
        keep = lic != "none"
        return pa.table(
            {
                "repo": pc.array_filter(batch["repo"], pa.array(keep)),
                "path": pc.array_filter(batch["path"], pa.array(keep)),
                "lang": pc.array_filter(batch["lang"], pa.array(keep)),
                "license": pa.array(lic[keep], pa.string()),
            }
        )

    out = src.map_batches(classify, batch_format="pyarrow").to_pandas()
    return out.sort_values(["repo", "path", "license"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# The-Stack / StarCoder quality filters (Kocetkov et al. 2022)
# ---------------------------------------------------------------------------

MAX_LINE_LEN = 400
MAX_AVG_LINE_LEN = 120.0
MIN_FRAC_ALNUM = 0.25
AUTOGEN_MARKERS = ["auto-generated", "do not edit"]


def _file_metrics(batch: pa.Table) -> pa.Table:
    """Vectorized per-file metrics: line stats via one split + segmented
    reductions, alnum fraction via an RE2 strip (same regex the oracle
    uses), autogen via lowercase substring."""
    content = batch["content"]
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    content = pc.fill_null(content, "")
    lines = pc.split_pattern(content, "\n")
    n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
    n_lines = n_lines.astype(np.int64)
    flat_len = pc.utf8_length(pc.list_flatten(lines)).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    starts = np.zeros(len(batch) + 1, dtype=np.int64)
    np.cumsum(n_lines, out=starts[1:])
    # segmented max / sum over the flattened per-line lengths
    max_line = np.zeros(len(batch), dtype=np.int64)
    sum_line = np.zeros(len(batch), dtype=np.int64)
    nz = n_lines > 0
    if flat_len.size:
        max_line[nz] = np.maximum.reduceat(flat_len, starts[:-1][nz])
        sum_line[nz] = np.add.reduceat(flat_len, starts[:-1][nz])
    avg_line = np.round(
        sum_line / np.maximum(n_lines, 1), 4
    )
    n_chars = pc.utf8_length(content).to_numpy(zero_copy_only=False)
    n_chars = n_chars.astype(np.int64)
    alnum = pc.utf8_length(
        pc.replace_substring_regex(content, "[^A-Za-z0-9]", "")
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    frac_alnum = np.round(alnum / np.maximum(n_chars, 1), 4)
    low = pc.utf8_lower(content)
    autogen = np.zeros(len(batch), dtype=bool)
    for m in AUTOGEN_MARKERS:
        autogen |= pc.match_substring(low, m).to_numpy(zero_copy_only=False)
    keep = (
        (max_line <= MAX_LINE_LEN)
        & (avg_line <= MAX_AVG_LINE_LEN)
        & (frac_alnum >= MIN_FRAC_ALNUM)
        & ~autogen
    )
    return pa.table(
        {
            "repo": batch["repo"],
            "path": batch["path"],
            "lang": batch["lang"],
            "n_lines": pa.array(n_lines, pa.int64()),
            "max_line_len": pa.array(max_line, pa.int64()),
            "avg_line_len": pa.array(avg_line, pa.float64()),
            "frac_alnum": pa.array(frac_alnum, pa.float64()),
            "autogen": pa.array(autogen, pa.bool_()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def stack_file_metrics(src: ray.data.Dataset) -> pd.DataFrame:
    """Per-file metric rows for the planted fixtures (repo LIKE
    'plants/%') — the per-metric driver check for the filter arithmetic."""

    def plants_only(batch: pa.Table) -> pa.Table:
        m = pc.starts_with(batch["repo"], "plants/")
        return _file_metrics(batch.filter(m))

    out = src.map_batches(plants_only, batch_format="pyarrow").to_pandas()
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


def stack_quality_filters(src: ray.data.Dataset) -> pd.DataFrame:
    """Corpus-wide (lang, keep) aggregate of the Stack filters: file
    count, autogen count, total lines, mean alnum fraction (of the
    per-file 4-dp-rounded values, re-rounded to 4 dp)."""
    metrics = src.map_batches(_file_metrics, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(
            ["lang", "keep", "n_lines", "autogen", "frac_alnum"]
        ).to_pandas()
        # sum the 4-dp fracs as exact e4 INTEGERS so the combine is
        # order-independent and bit-equal to the oracle at any scale
        df["frac_e4"] = (df["frac_alnum"] * 10000).round().astype("int64")
        g = df.groupby(["lang", "keep"], as_index=False).agg(
            n_files=("n_lines", "size"),
            n_autogen=("autogen", "sum"),
            sum_lines=("n_lines", "sum"),
            sum_frac_e4=("frac_e4", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = metrics.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["lang", "keep"], as_index=False).agg(
        n_files=("n_files", "sum"),
        n_autogen=("n_autogen", "sum"),
        sum_lines=("sum_lines", "sum"),
        sum_frac_e4=("sum_frac_e4", "sum"),
    )
    g["avg_frac_alnum"] = np.round(g["sum_frac_e4"] / (g["n_files"] * 10000.0), 4)
    g = g.drop(columns=["sum_frac_e4"])
    g["n_autogen"] = g["n_autogen"].astype("int64")
    return g.sort_values(["lang", "keep"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# winnowing (Schleimer, Wilkerson & Aiken 2003) + clone pairs
# ---------------------------------------------------------------------------

WINNOW_K = 12   # char k-gram length over the normalized stream
WINNOW_W = 8    # window size (guarantee: >=1 fingerprint per w hashes)

# position packing for the rightmost-min selection key: documents are
# bounded to 2^24 normalized chars per file (16 MiB of code — far above any
# real source file; assert-guarded below)
_POS_BITS = 24
_POS_MASK = (1 << _POS_BITS) - 1


def _normalize(content: pa.Array | pa.ChunkedArray) -> pa.Array:
    """lowercase + strip non-[a-z0-9] — the whitespace/punct-insensitive
    stream winnowing fingerprints (same RE2 the oracle replays)."""
    out = pc.replace_substring_regex(
        pc.utf8_lower(pc.fill_null(content, "")), "[^a-z0-9]", ""
    )
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def _gram_hashes_sha(norm: str, k: int) -> np.ndarray:
    """sha-prefix gram hash: int(sha256(gram)[:8 hex], 16) — DuckDB
    replays it as CAST(('0x' || substr(sha256(g),1,8)) AS BIGINT)."""
    n = len(norm) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    b = norm.encode()
    return np.array(
        [
            int.from_bytes(hashlib.sha256(b[i : i + k]).digest()[:4], "big")
            for i in range(n)
        ],
        dtype=np.int64,
    )


def _gram_hashes_u64(norm: str, k: int) -> np.ndarray:
    """Vectorized polynomial rolling hash over char codes with a splitmix64
    per-char finalizer — the no-strings 100 TB representation (k vector
    ops per doc).  Returned as int64 (two's-complement view) so Arrow/
    parquet round-trips losslessly."""
    arr = np.frombuffer(norm.encode(), dtype=np.uint8).astype(np.uint64)
    n = arr.size - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        z = arr * np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        acc = np.zeros(n, dtype=np.uint64)
        mult = np.uint64(1)
        prime = np.uint64(1099511628211)
        for j in range(k - 1, -1, -1):
            acc += z[j : j + n] * mult
            mult *= prime
    return acc.view(np.int64)


def _winnow_select(h: np.ndarray) -> np.ndarray:
    """Rightmost-minimum window selection: returns the sorted distinct
    indices selected by sliding a window of WINNOW_W over ``h`` and
    keeping, per window, the RIGHTMOST position of the minimum hash
    (the robust-winnowing tie rule).  Short sequences (0 < n < w) are one
    whole-sequence window.  Fully vectorized via a packed
    (hash << POS_BITS | reversed-pos) key and a sliding-window min."""
    n = h.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    assert n <= _POS_MASK, "winnowing: doc exceeds 2^24 normalized chars"
    # pack so that min(key) = (min hash, then MAX position)
    pos = np.arange(n, dtype=np.uint64)
    key = (h.astype(np.uint64) << np.uint64(_POS_BITS)) | (
        np.uint64(_POS_MASK) - pos
    )
    w = min(WINNOW_W, n)
    win = np.lib.stride_tricks.sliding_window_view(key, w)
    sel_keys = np.unique(win.min(axis=1))
    return np.sort(_POS_MASK - (sel_keys & np.uint64(_POS_MASK)).astype(np.int64))


def _doc_fingerprints(
    norm_texts: list[str], k: int, hash_repr: str
) -> list[tuple[np.ndarray, np.ndarray, int]]:
    """Per doc: (selected positions, selected hashes, n_grams)."""
    hasher = _gram_hashes_sha if hash_repr == "sha" else _gram_hashes_u64
    out = []
    for norm in norm_texts:
        h = hasher(norm, k)
        idx = _winnow_select(h)
        out.append((idx, h[idx], h.size))
    return out


def winnow(
    src: ray.data.Dataset,
    k: int = WINNOW_K,
    hash_repr: str = "sha",
) -> ray.data.Dataset:
    """Fingerprint stream: one row per selected (commit, pos, h).

    ``commit`` is the per-file identity (unique in the corpus; plants get
    distinct commits).  ``hash_repr="sha"`` is the oracle-parity hash;
    ``"u64"`` the vectorized scale path (same selection logic)."""
    if hash_repr not in ("sha", "u64"):
        raise ValueError(f"hash_repr must be 'sha' or 'u64', got {hash_repr!r}")

    def fp(batch: pa.Table) -> pa.Table:
        norm = _normalize(batch["content"])
        fps = _doc_fingerprints(norm.to_pylist(), k, hash_repr)
        commits, poss, hs = [], [], []
        commit_col = batch["commit"].to_pylist()
        for c, (idx, hh, _) in zip(commit_col, fps):
            commits.extend([c] * idx.size)
            poss.append(idx)
            hs.append(hh)
        return pa.table(
            {
                "commit": pa.array(commits, pa.string()),
                "pos": pa.array(
                    np.concatenate(poss) if poss else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "h": pa.array(
                    np.concatenate(hs) if hs else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    return src.map_batches(fp, batch_format="pyarrow")


def winnow_stats(
    src: ray.data.Dataset, k: int = WINNOW_K, hash_repr: str = "sha"
) -> pd.DataFrame:
    """Per-file winnowing summary: (repo, path, n_grams, n_fp, fp_xor)
    where fp_xor = bit-XOR of the selected hashes — pins the EXACT
    selected set without shipping it (DuckDB bit_xor replays it)."""

    def fp_stats(batch: pa.Table) -> pa.Table:
        norm = _normalize(batch["content"])
        fps = _doc_fingerprints(norm.to_pylist(), k, hash_repr)
        n_grams = np.array([g for _, _, g in fps], dtype=np.int64)
        n_fp = np.array([idx.size for idx, _, _ in fps], dtype=np.int64)
        fp_xor = np.array(
            [
                int(np.bitwise_xor.reduce(hh)) if hh.size else 0
                for _, hh, _ in fps
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "repo": batch["repo"],
                "path": batch["path"],
                "commit": batch["commit"],
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_fp": pa.array(n_fp, pa.int64()),
                "fp_xor": pa.array(fp_xor, pa.int64()),
            }
        )

    out = src.map_batches(fp_stats, batch_format="pyarrow").to_pandas()
    return (
        out.sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)[
            ["repo", "path", "commit", "n_grams", "n_fp", "fp_xor"]
        ]
    )


def clone_pairs(
    src: ray.data.Dataset,
    k: int = WINNOW_K,
    min_shared: int = 15,
    max_df: int = 10,
    hash_repr: str = "sha",
) -> pd.DataFrame:
    """MOSS clone report: unordered file pairs sharing >= ``min_shared``
    distinct winnowed hashes, after dropping hashes present in more than
    ``max_df`` files (the boilerplate cut).  Output (commit_a, commit_b,
    n_shared) with commit_a < commit_b, ordered.

    Shape: fingerprints -> distinct (h, commit) -> fused-partition groupby
    on h (df cut + per-bucket pair emission, bucket size bounded by
    max_df) -> second groupby counts distinct shared hashes per pair.  No
    all-pairs stage; the max_df cut bounds fan-out to C(max_df,2) per
    hash."""
    fps = winnow(src, k=k, hash_repr=hash_repr)

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        t = batch.select(["h", "commit"])
        return t.group_by(["h", "commit"]).aggregate([])

    dist = fps.map_batches(distinct_pairs, batch_format="pyarrow")
    n_parts = fused_parts(dist)

    def part_key(batch: pa.Table) -> pa.Table:
        hv = batch["h"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((hv % n_parts).astype(np.int64), pa.int64())
        )

    def emit_pairs(group: pa.Table) -> pa.Table:
        # within one fused partition: global distinct + df cut + pairs
        t = group.select(["h", "commit"]).group_by(["h", "commit"]).aggregate([])
        df = t.group_by("h").aggregate([("commit", "count")])
        ok = df.filter(
            (pc.field("commit_count") <= max_df)
            & (pc.field("commit_count") >= 2)
        )["h"]
        t = t.filter(pc.is_in(t["h"], value_set=ok))
        tp = t.to_pandas().sort_values(["h", "commit"])
        out_a, out_b, out_h = [], [], []
        for h, grp in tp.groupby("h", sort=False):
            cs = grp["commit"].to_numpy()
            ia, ib = np.triu_indices(cs.size, 1)
            out_a.append(cs[ia])
            out_b.append(cs[ib])
            out_h.append(np.full(ia.size, h, dtype=np.int64))
        if not out_a:
            return pa.table(
                {
                    "commit_a": pa.array([], pa.string()),
                    "commit_b": pa.array([], pa.string()),
                    "h": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "commit_a": pa.array(np.concatenate(out_a), pa.string()),
                "commit_b": pa.array(np.concatenate(out_b), pa.string()),
                "h": pa.array(np.concatenate(out_h), pa.int64()),
            }
        )

    pairs = (
        dist.map_batches(part_key, batch_format="pyarrow")
        .groupby("part")
        .map_groups(emit_pairs, batch_format="pyarrow")
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "commit_a" not in batch.column_names:
            return pa.table(
                {"commit_a": pa.array([], pa.string()),
                 "commit_b": pa.array([], pa.string()),
                 "h_count_distinct": pa.array([], pa.int64())})
        return batch.group_by(["commit_a", "commit_b"]).aggregate(
            [("h", "count_distinct")]
        )

    # (h, pair) rows are globally distinct already (distinct h per bucket,
    # one bucket per h), so a plain count after the pair groupby is exact
    counted = pairs.map_batches(count_partial, batch_format="pyarrow")
    agg = counted.groupby(["commit_a", "commit_b"]).aggregate(
        Sum("h_count_distinct", alias_name="n_shared")
    )
    out = agg.to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "commit_a": pd.Series([], dtype=str),
                "commit_b": pd.Series([], dtype=str),
                "n_shared": pd.Series([], dtype="int64"),
            }
        )
    out = out[out["n_shared"] >= min_shared]
    out["n_shared"] = out["n_shared"].astype("int64")
    return (
        out.sort_values(["commit_a", "commit_b"])
        .reset_index(drop=True)[["commit_a", "commit_b", "n_shared"]]
    )

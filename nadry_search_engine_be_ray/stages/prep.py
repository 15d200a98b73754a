"""Prep stage: doc identity, content hashing, field split, exact dedup.

Replaces reference operators M2 (docId = sha256, DocumentProcessor.java:
151-163), M1 field extraction (via stages/fieldsplit.py), and D1/D2 exact
dedup (visited set / compact-string set, MongoJava.java:75-115) — reexpressed
as vectorized ``map_batches`` transforms plus a shuffle- or broadcast-based
dedup (SURVEY.md §7.3).

The per-row invariant required by BASELINE.json ``input_hint`` — content
sha256 equality end-to-end — is established here (``content_sha256`` column)
and carried through the documents table untouched.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..stages.fieldsplit import split_fields


def make_url(repo: str, path: str, commit: str) -> str:
    """Doc identity string; doc_id = sha256(url) hex (M2 analog).  Derived,
    never stored — prepped keeps only (repo, path, commit) and readers
    recompute (url and its 64-char hex sha cost ~45% of the Documents
    table when materialized)."""
    return f"{repo}/{path}@{commit}"


def doc_id_of(url: str) -> str:
    return hashlib.sha256(url.encode()).hexdigest()


def derive_urls(table: pa.Table) -> list[str]:
    return [
        make_url(r, p, c)
        for r, p, c in zip(
            table["repo"].to_pylist(),
            table["path"].to_pylist(),
            table["commit"].to_pylist(),
        )
    ]


def prep_batch(batch: pa.Table, content_mode: str = "code") -> pa.Table:
    """Add doc_int (60-bit sha-of-url prefix), content_sha256 (binary 32),
    title, description columns.  Pure, stateless, batch-vectorized where the
    kernel allows (hashing loops are C-speed hashlib calls per row).

    ``content_mode="html"`` switches M1 to the reference's HTML extraction
    (stages/htmlproc.py, DocumentProcessor.java:32-81): title/description
    come from the markup and the ``content`` column is REPLACED by the
    selector-extracted main text (the reference's ProcessedDocument.content
    is mainContent, not raw HTML); content_sha256 still hashes the RAW
    input, preserving the end-to-end sha invariant.

    60-bit doc key: int64-safe in Arrow/Ray shuffles (uint64 group keys
    corrupt in Ray's sort-based groupby) and monotone in doc_id hex order
    (the declared tiebreak).  Production note: 10^12-file scale should use
    a 128-bit (hi, lo) pair; collision odds at 60 bits are ~1e-7 per 10^6
    docs and the build asserts uniqueness (SURVEY.md §4.2 ordering)."""
    repo = batch["repo"].to_pylist()
    path = batch["path"].to_pylist()
    commit = batch["commit"].to_pylist()
    content = batch["content"].to_pylist()

    n = len(repo)
    doc_ints = np.empty(n, dtype=np.int64)
    for i in range(n):
        h = hashlib.sha256(make_url(repo[i], path[i], commit[i]).encode())
        doc_ints[i] = int(h.hexdigest()[:15], 16)
    content_sha = [
        hashlib.sha256((c or "").encode()).digest() for c in content
    ]
    titles = []
    descriptions = []
    if content_mode == "html":
        from .htmlproc import split_fields_html

        bodies = []
        for i in range(n):
            t, d, b = split_fields_html(content[i])
            titles.append(t)
            descriptions.append(d)
            bodies.append(b)
        batch = batch.set_column(
            batch.schema.get_field_index("content"),
            "content",
            pa.array(bodies, pa.string()),
        )
    else:
        for i in range(n):
            t, d, _ = split_fields(path[i], content[i])
            titles.append(t)
            descriptions.append(d)

    return batch.append_column("doc_int", pa.array(doc_ints, pa.int64())) \
        .append_column("content_sha256", pa.array(content_sha, pa.binary())) \
        .append_column("title", pa.array(titles, pa.string())) \
        .append_column("description", pa.array(descriptions, pa.string()))


def losers_from_group(group: pa.Table) -> pa.Table:
    """Per content_sha256 group: emit every doc_int EXCEPT the min — the
    deterministic keep-first rule (keep min doc_id; SURVEY.md §2.7 D2 note:
    the reference keeps first-crawled, which is timing-dependent; we declare
    min-doc_id order)."""
    if group.num_rows <= 1:
        return pa.table({"doc_int": pa.array([], pa.int64())})
    ints = group["doc_int"].to_numpy(zero_copy_only=False)
    keep = ints.min()
    return pa.table({"doc_int": pa.array(ints[ints != keep], pa.int64())})


def sorted_membership_mask(sorted_ids: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``ids`` in a SORTED int64 array — the shared
    broadcast-anti-join idiom (searchsorted with the end-sentinel guard:
    out-of-range indices compare against element [0], which can never equal
    those values).  Returns a bool mask aligned with ``ids``."""
    if sorted_ids.size == 0:
        return np.zeros(ids.size, dtype=bool)
    idx = np.searchsorted(sorted_ids, ids)
    idx[idx == sorted_ids.size] = 0
    return sorted_ids[idx] == ids


def make_loser_filter(loser_doc_ints: np.ndarray):
    """Vectorized anti-join filter: drop rows whose doc_int is a known
    duplicate loser.  ``loser_doc_ints`` must be sorted; it is broadcast via
    ``ray.put`` once and shared zero-copy by every task."""
    losers = np.sort(np.asarray(loser_doc_ints, dtype=np.int64))

    def _filter(batch: pa.Table) -> pa.Table:
        if losers.size == 0:
            return batch
        ints = batch["doc_int"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~sorted_membership_mask(losers, ints)))

    return _filter


def dedup_shuffle(ds):
    """Full-shuffle exact dedup: groupby(content_sha256) keep min doc_int.
    One all-to-all of the corpus; use when the duplicate rate is too high for
    the broadcast strategy."""

    def keep_first(group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group
        ints = group["doc_int"].to_numpy(zero_copy_only=False)
        return group.take(pa.array([int(np.argmin(ints))]))

    return ds.groupby("content_sha256").map_groups(
        keep_first, batch_format="pyarrow"
    )

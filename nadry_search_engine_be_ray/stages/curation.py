"""Corpus-curation transforms for LLM training-data pipelines: benchmark
decontamination, token-window chunking, and PII redaction.

These are the curation ops that sit beside dedup/quality in a 100 TB
training-data pipeline (beyond the reference's own operator set; task brief
"operations a large-scale training-data pipeline would need"):

* ``decontaminate`` — flag training docs that share any token n-gram with a
  benchmark (eval) set, the standard test-set-overlap guard (e.g. GPT-3
  appendix C / PaLM-style 8-gram decontamination; public method).  Ray
  shape: the benchmark gram set is small (eval sets are), so it broadcasts
  ONCE via ``ray.put`` and the scan is an embarrassingly parallel
  ``map_batches`` filter — no shuffle.  Grams stay strings here for exact
  SQL-oracle parity; the 100 TB path would hash them to 64-bit and keep the
  same broadcast shape (or shard the set if the benchmark were huge).
* ``chunk_windows`` — split each doc's token stream into fixed-size windows
  with stride (training context packing / RAG chunking).  Pure per-doc
  ``map_batches`` flat emit; no shuffle.
* ``redact_pii`` — regex redaction of emails / phone numbers with match
  counts.  Patterns are RE2-compatible so a SQL oracle reproduces the
  rewrite bitwise; compiled once per actor.

All three loop Python over the docs WITHIN a batch (regex + set probes per
text, the same per-doc shape as stages/textstats.py); the distributed story
is batches × actors, not intra-batch SIMD.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .textstats import _WORD

# RE2-compatible AND Python-re-compatible (no lookaround, no backrefs) so
# the DuckDB oracle's regexp_replace is bit-identical
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"


def doc_ngrams(tokens: list[str], n: int) -> list[str]:
    """Space-joined token n-grams (positions, not distinct)."""
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def benchmark_gram_set(texts: list[str], n: int = 8) -> frozenset[str]:
    """The benchmark side: distinct n-grams over all eval texts."""
    grams: set[str] = set()
    for t in texts:
        grams.update(doc_ngrams(_WORD.findall((t or "").lower()), n))
    return frozenset(grams)


class DecontaminateBatch:
    """Actor-pool stage: per doc, count token n-gram positions that hit the
    broadcast benchmark gram set.  ``bench_ref`` is a ``ray.put`` handle
    (fetched once per actor in __init__) or a plain set for driver use."""

    def __init__(self, bench_ref, n: int = 8):
        import ray

        self.n = n
        self.bench = (
            ray.get(bench_ref)
            if isinstance(bench_ref, ray.ObjectRef)
            else bench_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        bench = self.bench
        ids = batch["doc_id"].to_pylist()
        n_grams_o, n_cont_o, flag_o = [], [], []
        for text in batch["text"].to_pylist():
            toks = _WORD.findall((text or "").lower())
            grams = doc_ngrams(toks, n)
            hits = sum(1 for g in grams if g in bench)
            n_grams_o.append(len(grams))
            n_cont_o.append(hits)
            flag_o.append(hits > 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_grams": pa.array(n_grams_o, pa.int64()),
                "n_contaminated": pa.array(n_cont_o, pa.int64()),
                "contaminated": pa.array(flag_o, pa.bool_()),
            }
        )


def decontaminate(ds, bench_texts: list[str], n: int = 8,
                  concurrency: int | None = None):
    """Flag docs in ``ds`` (doc_id, text) sharing any token ``n``-gram with
    ``bench_texts``.  Returns a Dataset (doc_id, n_grams, n_contaminated,
    contaminated) — the caller drops or audits the flagged docs."""
    import ray

    bench_ref = ray.put(benchmark_gram_set(bench_texts, n))
    return ds.map_batches(
        DecontaminateBatch,
        fn_constructor_args=(bench_ref, n),
        batch_format="pyarrow",
        concurrency=concurrency or 4,
    )


class ChunkWindowsBatch:
    """Per-doc token-window splitter: windows of ``window`` tokens starting
    every ``stride`` tokens (starts 0, stride, 2*stride, ... < n_tokens; the
    tail window may be short).  Zero-token docs emit no chunks."""

    def __init__(self, window: int = 32, stride: int = 16):
        assert window > 0 and stride > 0
        self.window, self.stride = window, stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        w, s = self.window, self.stride
        d_o, c_o, st_o, nt_o, tx_o = [], [], [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = _WORD.findall((text or "").lower())
            for k, start in enumerate(range(0, len(toks), s)):
                win = toks[start : start + w]
                d_o.append(did)
                c_o.append(k)
                st_o.append(start)
                nt_o.append(len(win))
                tx_o.append(" ".join(win))
        return pa.table(
            {
                "doc_id": pa.array(d_o, pa.int64()),
                "chunk_id": pa.array(c_o, pa.int64()),
                "start_tok": pa.array(st_o, pa.int64()),
                "n_tokens": pa.array(nt_o, pa.int64()),
                "chunk_text": pa.array(tx_o, pa.string()),
            }
        )


def chunk_windows(ds, window: int = 32, stride: int = 16):
    """Split every doc into token windows; returns a Dataset
    (doc_id, chunk_id, start_tok, n_tokens, chunk_text)."""
    return ds.map_batches(
        ChunkWindowsBatch(window, stride), batch_format="pyarrow"
    )


class RepetitionBatch:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    public method), per doc over the token stream:

    * ``top2gram_frac`` — occurrences of the MOST COMMON 2-gram as a
      fraction of all 2-gram positions (0.0 when < 2 tokens)
    * ``dup5gram_frac`` — fraction of 5-gram positions whose gram occurs
      more than once in the doc (0.0 when < 5 tokens)
    * ``repetitive`` — Gopher-ish rejection flag (top2 > 0.20 or
      dup5 > 0.30)
    """

    TOP2_MAX = 0.20
    DUP5_MAX = 0.30

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch["doc_id"].to_pylist()
        top2_o, dup5_o, flag_o = [], [], []
        for text in batch["text"].to_pylist():
            toks = _WORD.findall((text or "").lower())
            g2 = Counter(doc_ngrams(toks, 2))
            t2 = sum(g2.values())
            top2 = (max(g2.values()) / t2) if t2 else 0.0
            g5 = Counter(doc_ngrams(toks, 5))
            t5 = sum(g5.values())
            dup5 = (
                sum(c for c in g5.values() if c > 1) / t5 if t5 else 0.0
            )
            top2_o.append(round(top2, 9))
            dup5_o.append(round(dup5, 9))
            flag_o.append(top2 > self.TOP2_MAX or dup5 > self.DUP5_MAX)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "top2gram_frac": pa.array(top2_o, pa.float64()),
                "dup5gram_frac": pa.array(dup5_o, pa.float64()),
                "repetitive": pa.array(flag_o, pa.bool_()),
            }
        )


def repetition_scores(ds):
    """Per-doc Gopher repetition signals; shuffle-free map_batches."""
    return ds.map_batches(RepetitionBatch(), batch_format="pyarrow")


class _CountTokensBatch:
    """(part, doc_id, n_tokens) rows; part = doc_id // part_docs gives a
    deterministic doc_id-range partitioning for the prefix-sum exchange."""

    def __init__(self, part_docs: int):
        self.part_docs = part_docs

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        n = [
            len(_WORD.findall((t or "").lower()))
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "part": pa.array(ids // self.part_docs, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(np.array(n, dtype="int64"), pa.int64()),
            }
        )


def pack_sequences(ds, context: int = 128, part_docs: int = 4096):
    """GPT-style sequence packing: conceptually concatenate every doc's
    token stream in doc_id order and split at ``context``-token boundaries;
    returns the (seq_id, doc_id, doc_start_tok, n_tokens) segment map (a
    doc straddling a boundary emits one row per sequence it touches).

    Distributed prefix sum, no driver-side doc materialization: pass 1
    emits thin (part, doc_id, n_tokens) rows (part = doc_id // part_docs);
    the per-part token sums — n_docs / part_docs rows, the ONLY driver
    materialization — give each part its global base offset, broadcast via
    ``ray.put``; pass 2 is a groupby("part") whose tasks cumsum within
    their part and emit segments vectorized (np.repeat over per-doc
    sequence counts)."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    counts = ds.map_batches(
        _CountTokensBatch(part_docs), batch_format="pyarrow"
    ).materialize()
    sums = (
        counts.groupby("part")
        .aggregate(Sum("n_tokens", alias_name="part_tokens"))
        .to_pandas()
        .sort_values("part")
    )
    parts = sums["part"].to_numpy().astype("int64")
    bases = np.concatenate(
        [[0], np.cumsum(sums["part_tokens"].to_numpy().astype("int64"))[:-1]]
    )
    base_ref = ray.put((parts, bases))

    def emit_segments(group: pa.Table) -> pa.Table:
        parts_a, bases_a = ray.get(base_ref)
        part = int(group["part"][0].as_py())
        base = int(bases_a[np.searchsorted(parts_a, part)])
        g = group.sort_by("doc_id")
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        n = g["n_tokens"].to_numpy(zero_copy_only=False).astype("int64")
        off = base + np.concatenate([[0], np.cumsum(n)[:-1]])
        keep = n > 0
        ids, n, off = ids[keep], n[keep], off[keep]
        if ids.size == 0:
            return pa.table(
                {
                    "seq_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "doc_start_tok": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        first = off // context
        last = (off + n - 1) // context
        cnt = last - first + 1
        total = int(cnt.sum())
        rep = np.repeat(np.arange(ids.size), cnt)
        # within-doc sequence index 0..cnt-1, then the global seq id
        starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        k = np.arange(total) - np.repeat(starts, cnt)
        seq = np.repeat(first, cnt) + k
        o = off[rep]
        nn = n[rep]
        lo = np.maximum(seq * context, o)
        hi = np.minimum((seq + 1) * context, o + nn)
        return pa.table(
            {
                "seq_id": pa.array(seq, pa.int64()),
                "doc_id": pa.array(ids[rep], pa.int64()),
                "doc_start_tok": pa.array(lo - o, pa.int64()),
                "n_tokens": pa.array(hi - lo, pa.int64()),
            }
        )

    return counts.groupby("part").map_groups(
        emit_segments, batch_format="pyarrow"
    )


class RedactPiiBatch:
    """Regex PII scrub with match counts; patterns compiled once per actor."""

    def __init__(self):
        self.email = re.compile(EMAIL_RE)
        self.phone = re.compile(PHONE_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        clean_o, ne_o, np_o = [], [], []
        for text in batch["text"].to_pylist():
            t = text or ""
            ne = len(self.email.findall(t))
            t2 = self.email.sub("[EMAIL]", t)
            np_ = len(self.phone.findall(t2))
            clean_o.append(self.phone.sub("[PHONE]", t2))
            ne_o.append(ne)
            np_o.append(np_)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "clean_text": pa.array(clean_o, pa.string()),
                "n_emails": pa.array(ne_o, pa.int64()),
                "n_phones": pa.array(np_o, pa.int64()),
            }
        )


def redact_pii(ds, concurrency: int | None = None):
    """Redact emails then phone numbers (in that order — counts are taken
    against the text AFTER the email pass so an email containing a
    phone-shaped digit run is not double-counted).  Returns a Dataset
    (doc_id, clean_text, n_emails, n_phones)."""
    return ds.map_batches(
        RedactPiiBatch, batch_format="pyarrow", concurrency=concurrency or 4
    )


def _c4_keep_line(line: str) -> bool:
    """One C4-style line rule (Raffel et al. 2020 §2.2, simplified to the
    subset that is exactly SQL-expressible): keep a line iff it has >= 5
    whitespace words, contains no '{', and mentions neither 'javascript'
    nor 'lorem ipsum' (case-insensitive)."""
    if line.count(" ") + 1 < 5 or not line.strip():
        return False
    low = line.lower()
    return (
        "{" not in line
        and "javascript" not in low
        and "lorem ipsum" not in low
    )


def c4_clean(ds, min_words: int = 50):
    """C4-style document cleaning: apply line filters, drop docs whose kept
    text falls under ``min_words`` words.  Embarrassingly parallel per-doc
    map_batches — no shuffle; the 100 TB shape is pure scan bandwidth.

    Returns (doc_id, clean_text, n_lines_kept, n_lines_dropped).  Lines are
    '\\n'-separated; a doc with no newline is a single line.
    """

    def clean(batch: pa.Table) -> pa.Table:
        ids, txt_o, kept_o, drop_o = [], [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            lines = (text or "").split("\n")
            kept = [ln for ln in lines if _c4_keep_line(ln)]
            clean_text = "\n".join(kept)
            if clean_text.count(" ") + 1 < min_words or not kept:
                continue
            ids.append(did)
            txt_o.append(clean_text)
            kept_o.append(len(kept))
            drop_o.append(len(lines) - len(kept))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "clean_text": pa.array(txt_o, pa.string()),
                "n_lines_kept": pa.array(kept_o, pa.int64()),
                "n_lines_dropped": pa.array(drop_o, pa.int64()),
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow")


def paragraph_dedup(ds):
    """Corpus-wide exact paragraph dedup (the C4 / RefinedWeb span-dedup
    family at paragraph granularity): every '\\n'-separated paragraph keeps
    only its globally FIRST occurrence (min (doc_id, position)); documents
    are reassembled from their surviving paragraphs.

    Ray shape (scale-honest): explode (doc_id, para_idx, para) ->
    groupby(para) marks the min-(doc_id, idx) holder per group (the only
    all-to-all; paragraph text is the key, so identical paragraphs
    co-locate) -> groupby(doc_id) reassembles kept paragraphs in original
    order.  At 100 TB the first groupby would key on a 128-bit paragraph
    hash rather than the text to shrink the exchange; the text key keeps
    the SQL oracle exact here and the shape is identical.

    Returns (doc_id, clean_text, n_paras_kept, n_dupes_removed); docs whose
    every paragraph was a duplicate come out with empty clean_text and
    n_paras_kept = 0.
    """

    def explode(batch: pa.Table) -> pa.Table:
        ids, idxs, paras = [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for i, p in enumerate((text or "").split("\n")):
                ids.append(did)
                idxs.append(i)
                paras.append(p)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "para_idx": pa.array(idxs, pa.int64()),
                "para": pa.array(paras, pa.string()),
            }
        )

    def mark_first(group: pa.Table) -> pa.Table:
        # min (doc_id, para_idx) holder keeps the paragraph
        t = group.sort_by([("doc_id", "ascending"), ("para_idx", "ascending")])
        keep = [True] + [False] * (t.num_rows - 1)
        return t.append_column("keep", pa.array(keep, pa.bool_()))

    def reassemble(group: pa.Table) -> pa.Table:
        t = group.sort_by([("para_idx", "ascending")])
        kept = [
            p
            for p, k in zip(t["para"].to_pylist(), t["keep"].to_pylist())
            if k
        ]
        return pa.table(
            {
                "doc_id": pa.array([t["doc_id"][0].as_py()], pa.int64()),
                "clean_text": pa.array(["\n".join(kept)], pa.string()),
                "n_paras_kept": pa.array([len(kept)], pa.int64()),
                "n_dupes_removed": pa.array(
                    [t.num_rows - len(kept)], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("para")
        .map_groups(mark_first, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(reassemble, batch_format="pyarrow")
    )

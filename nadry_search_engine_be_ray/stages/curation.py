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

Intra-batch work is vectorized: tokens and n-grams come from the Arrow
regex-split / join kernels in ``stages/lm.py`` and PII redaction uses
Arrow's RE2 replace/count kernels; no Python loop touches a token in the
hot paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lm import exploded_tokens, ngram_strings
from .partitioning import fused_parts
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
        bench = (
            ray.get(bench_ref)
            if isinstance(bench_ref, ray.ObjectRef)
            else bench_ref
        )
        # once per actor: gram set -> Arrow array for vectorized is_in
        self.bench_arr = pa.array(sorted(bench), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = len(batch)
        doc_pos, flat, _ = exploded_tokens(batch["text"])
        grams, starts = ngram_strings(doc_pos, flat, self.n)
        gdoc = doc_pos[starts]
        n_grams = np.bincount(gdoc, minlength=n_rows)
        if len(grams) and len(self.bench_arr):
            hit = pc.is_in(grams, value_set=self.bench_arr).to_numpy(
                zero_copy_only=False
            )
            n_cont = np.bincount(gdoc[hit], minlength=n_rows)
        else:
            n_cont = np.zeros(n_rows, np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_contaminated": pa.array(n_cont, pa.int64()),
                "contaminated": pa.array(n_cont > 0, pa.bool_()),
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
        # fully vectorized: window start arithmetic in numpy, token gather
        # + per-chunk space join as Arrow take/ListArray/binary_join
        w, s = self.window, self.stride
        _, flat, lens = exploded_tokens(batch["text"])
        offsets = np.concatenate(([0], np.cumsum(lens)))
        n_chunks = np.where(lens > 0, (lens + s - 1) // s, 0)
        doc_of_chunk = np.repeat(
            np.arange(len(batch), dtype=np.int64), n_chunks
        )
        cbase = np.concatenate(([0], np.cumsum(n_chunks)))
        chunk_id = (
            np.arange(int(n_chunks.sum()), dtype=np.int64)
            - cbase[doc_of_chunk]
        )
        start_tok = chunk_id * s
        chunk_len = np.minimum(w, lens[doc_of_chunk] - start_tok)
        tok_base = offsets[doc_of_chunk] + start_tok
        run_off = np.concatenate(([0], np.cumsum(chunk_len)))
        intra = (
            np.arange(int(chunk_len.sum()), dtype=np.int64)
            - np.repeat(run_off[:-1], chunk_len)
        )
        gather = np.repeat(tok_base, chunk_len) + intra
        lists = pa.ListArray.from_arrays(
            pa.array(run_off, pa.int32()), flat.take(pa.array(gather))
        )
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[doc_of_chunk], pa.int64()),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "start_tok": pa.array(start_tok, pa.int64()),
                "n_tokens": pa.array(chunk_len, pa.int64()),
                "chunk_text": pc.binary_join(lists, " "),
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

    @staticmethod
    def _gram_stats(doc_pos, flat, n: int, n_rows: int):
        """Per-row (total gram positions, max single-gram count, positions
        of grams occurring > once) via one arrow group_by — no token loop."""
        grams, starts = ngram_strings(doc_pos, flat, n)
        gdoc = doc_pos[starts]
        total = np.bincount(gdoc, minlength=n_rows).astype(np.float64)
        top = np.zeros(n_rows, np.float64)
        dup = np.zeros(n_rows, np.float64)
        if len(grams):
            g = pa.table(
                {"d": pa.array(gdoc, pa.int64()), "g": grams}
            ).group_by(["d", "g"]).aggregate([("g", "count")])
            dd = g["d"].to_numpy(zero_copy_only=False)
            cc = g["g_count"].to_numpy(zero_copy_only=False).astype(np.float64)
            np.maximum.at(top, dd, cc)
            dup = np.bincount(
                dd, weights=np.where(cc > 1, cc, 0.0), minlength=n_rows
            )
        return total, top, dup

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = len(batch)
        doc_pos, flat, _ = exploded_tokens(batch["text"])
        t2, top2c, _ = self._gram_stats(doc_pos, flat, 2, n_rows)
        t5, _, dup5c = self._gram_stats(doc_pos, flat, 5, n_rows)
        with np.errstate(invalid="ignore"):
            top2 = np.where(t2 > 0, top2c / np.maximum(t2, 1.0), 0.0)
            dup5 = np.where(t5 > 0, dup5c / np.maximum(t5, 1.0), 0.0)
        flag = (top2 > self.TOP2_MAX) | (dup5 > self.DUP5_MAX)
        # Python round per doc (cheap: one call per ROW, not per token)
        # keeps the emitted values bit-identical to the original loop
        top2_o = [round(float(x), 9) for x in top2]
        dup5_o = [round(float(x), 9) for x in dup5]
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "top2gram_frac": pa.array(top2_o, pa.float64()),
                "dup5gram_frac": pa.array(dup5_o, pa.float64()),
                "repetitive": pa.array(flag, pa.bool_()),
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
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        _, _, lens = exploded_tokens(batch["text"])
        return pa.table(
            {
                "part": pa.array(ids // self.part_docs, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
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
    """Regex PII scrub with match counts — Arrow's RE2 replace/count
    kernels over the whole column (the patterns are RE2-compatible by
    design, the same property the DuckDB oracle relies on)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        ne = pc.count_substring_regex(texts, pattern=EMAIL_RE)
        t2 = pc.replace_substring_regex(
            texts, pattern=EMAIL_RE, replacement="[EMAIL]"
        )
        np_ = pc.count_substring_regex(t2, pattern=PHONE_RE)
        clean = pc.replace_substring_regex(
            t2, pattern=PHONE_RE, replacement="[PHONE]"
        )
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "clean_text": clean,
                "n_emails": pc.cast(ne, pa.int64()),
                "n_phones": pc.cast(np_, pa.int64()),
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
        # vectorized line rules: split to a list<string>, evaluate every
        # rule as an Arrow kernel over the flat line array, reassemble kept
        # lines per doc via ListArray offsets + binary_join
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lines = pc.split_pattern(pc.fill_null(texts, ""), "\n")
        nl = pc.list_value_length(lines).to_numpy().astype(np.int64)
        flat = pc.list_flatten(lines)
        doc_pos = np.repeat(np.arange(len(batch), dtype=np.int64), nl)
        low = pc.utf8_lower(flat)
        keep_line = pc.and_(
            pc.and_(
                pc.greater_equal(pc.add(pc.count_substring(flat, " "), 1), 5),
                pc.not_equal(pc.utf8_trim_whitespace(flat), ""),
            ),
            pc.and_(
                pc.invert(pc.match_substring(flat, "{")),
                pc.and_(
                    pc.invert(pc.match_substring(low, "javascript")),
                    pc.invert(pc.match_substring(low, "lorem ipsum")),
                ),
            ),
        ).to_numpy(zero_copy_only=False)
        kept_counts = np.bincount(doc_pos[keep_line], minlength=len(batch))
        kept_lists = pa.ListArray.from_arrays(
            pa.array(
                np.concatenate(([0], np.cumsum(kept_counts))), pa.int32()
            ),
            flat.filter(pa.array(keep_line)),
        )
        joined = pc.binary_join(kept_lists, "\n")
        doc_words = pc.add(pc.count_substring(joined, " "), 1).to_numpy(
            zero_copy_only=False
        )
        doc_keep = pa.array((kept_counts > 0) & (doc_words >= min_words))
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()).filter(doc_keep),
                "clean_text": joined.filter(doc_keep),
                "n_lines_kept": pa.array(
                    kept_counts, pa.int64()
                ).filter(doc_keep),
                "n_lines_dropped": pa.array(
                    nl - kept_counts, pa.int64()
                ).filter(doc_keep),
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
    n_parts_fused = fused_parts(ds)

    import zlib

    def explode(batch: pa.Table) -> pa.Table:
        # vectorized split + coarse partition of the paragraph key (all
        # occurrences of a paragraph land in one partition, so first-marking
        # below is semantically a groupby(para) with ONE Python call per
        # partition, not one per distinct paragraph)
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(texts, ""), "\n")
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        flat = pc.list_flatten(lists)
        doc_pos = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        idx = np.arange(doc_pos.size, dtype=np.int64) - starts[doc_pos]
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(flat):
            de = flat.dictionary_encode()
            codes = de.indices.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            base = np.array(
                [zlib.crc32(p.encode()) for p in de.dictionary.to_pylist()],
                dtype=np.int64,
            )
            part = base[codes] % n_parts_fused
        else:
            part = np.empty(0, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[doc_pos], pa.int64()),
                "para_idx": pa.array(idx, pa.int64()),
                "para": flat,
                "part": pa.array(part, pa.int64()),
            }
        )

    def mark_first_partition(group: pa.Table) -> pa.Table:
        # min (doc_id, para_idx) holder keeps the paragraph — one sorted
        # pass over the partition, keep = first row of each para segment
        if len(group) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "para_idx": pa.array([], pa.int64()),
                    "para": pa.array([], pa.string()),
                    "dpart": pa.array([], pa.int64()),
                    "keep": pa.array([], pa.bool_()),
                }
            )
        de = group["para"].combine_chunks().dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        docs = group["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        idxs = group["para_idx"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.lexsort((idxs, docs, codes))
        keep = np.zeros(codes.size, dtype=bool)
        sc = codes[order]
        first = np.concatenate(([True], sc[1:] != sc[:-1]))
        keep[order[first]] = True
        return pa.table(
            {
                "doc_id": group["doc_id"],
                "para_idx": group["para_idx"],
                "para": group["para"],
                "dpart": pa.array(docs % n_parts_fused, pa.int64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    def reassemble_partition(group: pa.Table) -> pa.Table:
        # per coarse doc partition: sort by (doc, idx), rebuild each doc's
        # surviving text with ListArray offsets + one binary_join kernel
        docs = group["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        idxs = group["para_idx"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = group["keep"].to_numpy(zero_copy_only=False)
        order = np.lexsort((idxs, docs))
        docs, idxs, keep = docs[order], idxs[order], keep[order]
        paras = group["para"].combine_chunks().take(pa.array(order))
        uniq, inv = np.unique(docs, return_inverse=True)
        total = np.bincount(inv)
        kept_n = np.bincount(inv[keep], minlength=uniq.size)
        kept_paras = paras.filter(pa.array(keep))
        lists = pa.ListArray.from_arrays(
            pa.array(
                np.concatenate(([0], np.cumsum(kept_n))), pa.int32()
            ),
            kept_paras,
        )
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "clean_text": pc.binary_join(lists, "\n"),
                "n_paras_kept": pa.array(kept_n, pa.int64()),
                "n_dupes_removed": pa.array(total - kept_n, pa.int64()),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(mark_first_partition, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(reassemble_partition, batch_format="pyarrow")
    )


def span_corruption(ds, p: float = 0.15, salt: str = "mask-v1",
                    id_col: str = "doc_id", text_col: str = "text"):
    """T5-style span corruption (Raffel et al. 2020 §3.1.4): mask a
    deterministic ~``p`` fraction of whitespace tokens, merge consecutive
    masked tokens into spans, and emit (input_text with one
    ``<extra_id_k>`` sentinel per span, target_text = sentinel + masked
    tokens per span) — the denoising-objective pair construction.

    Determinism contract (shared verbatim with the SQL oracle): token i
    (1-based, whitespace split of trimmed text) is masked iff
    ``sha_bucket(f"{salt}:{doc_id}:{i}") < floor(p * 2**32)`` — the same
    salted-sha primitive as the sampling family, so the draw is a pure
    function of (doc, position), reproducible at any parallelism.  At
    100 TB the per-token sha has a documented u64-splitmix fast path
    (the dup_spans hash_repr precedent); the sha form is the
    driver-checkable one.

    Per-batch work: one split + explode, vectorized mask/island math
    (islands = i - running-count), and a per-doc string assembly (string
    building is inherently per-doc; everything upstream is columnar).
    Returns a Dataset of (id, input_text, target_text).
    """
    import pandas as pd

    from .sampling import sha_bucket

    threshold = int(np.floor(p * 2 ** 32))

    def corrupt(batch: pa.Table) -> pa.Table:
        t = pd.Series(batch[text_col].to_pandas()).fillna("").str.strip()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        toks = t.str.split(r"\s+", regex=True)
        toks = toks.apply(lambda xs: [x for x in xs if x != ""])
        out_in, out_tg = [], []
        for di, ts in zip(ids, toks):
            if not ts:
                out_in.append("")
                out_tg.append("")
                continue
            b = sha_bucket([f"{di}:{i}" for i in range(1, len(ts) + 1)],
                           salt)
            m = b < threshold
            first = m & ~np.r_[False, m[:-1]]
            k = np.cumsum(first) - 1  # span index per position
            inp, tgt = [], []
            for i, tok in enumerate(ts):
                if not m[i]:
                    inp.append(tok)
                elif first[i]:
                    inp.append(f"<extra_id_{k[i]}>")
                    tgt.append(f"<extra_id_{k[i]}>")
                    tgt.append(tok)
                else:
                    tgt.append(tok)
            out_in.append(" ".join(inp))
            out_tg.append(" ".join(tgt))
        return pa.table(
            {id_col: batch[id_col],
             "input_text": pa.array(out_in, pa.string()),
             "target_text": pa.array(out_tg, pa.string())}
        )

    return ds.map_batches(corrupt, batch_format="pyarrow")

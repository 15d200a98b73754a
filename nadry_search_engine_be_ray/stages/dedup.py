"""Deduplication stages for training-data pipelines.

Five dedup families over the ``documents`` / ``embeddings`` tables, each
expressed Ray-Data-first (SURVEY.md §2.7 D1/D2 generalized):

* exact (sha/text hash-partition + per-group keep-min)       — shuffle dedup
* MinHash + LSH (shingle -> minhash -> band -> bucket groupby -> candidate
  pairs -> distributed exact n-gram Jaccard verify)          — near-dup
* SimHash (64-bit, 16-bit band buckets -> hamming verify)    — near-dup
* n-gram Jaccard all-pairs (gram-bucket candidates -> the same distributed
  exact verify, so reported jaccard values are always exact)
* embedding cosine (hyperplane-band LSH buckets -> within-bucket matmul)

All candidate generation is shuffle-based (groupby on bucket keys) and all
verification is distributed (union + groupby; no pair/text materialization
on the driver).  Pair outputs are canonical (a < b) and deterministic.
"""

from __future__ import annotations

import hashlib
import os
import re
import zlib

import numpy as np
import pyarrow as pa

from .partitioning import fused_parts

_WORD = re.compile(r"[A-Za-z0-9_]+")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_text_sha(batch: pa.Table, text_col: str = "text") -> pa.Table:
    shas = [
        hashlib.sha256((t or "").encode()).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("text_sha256", pa.array(shas, pa.string()))


def exact_dedup_groups(ds, id_col: str = "doc_id", text_col: str = "text"):
    """groupby(sha) -> (doc_id=min id, n_dups).  One row per distinct text.
    Native Min/Count aggregates (mergeable partials inside the sort-based
    shuffle) — no per-group Python call."""
    from ray.data.aggregate import Count, Min

    withsha = ds.map_batches(
        lambda b: add_text_sha(b, text_col), batch_format="pyarrow"
    )
    agg = withsha.groupby("text_sha256").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_dups")
    )
    return agg.select_columns([id_col, "n_dups"])


# ---------------------------------------------------------------------------
# "compact string" near-dup signature (operator M9,
# webCrawler/WebCrawler.java:224-243): concatenation of the first character
# of every whitespace token longer than 2 chars whose first char is
# alphanumeric (ASCII semantics declared; the reference uses
# Character.isLetterOrDigit).  Docs sharing a signature are near-dups —
# dedup is a groupby(signature) keep-min, exactly like D2.
# ---------------------------------------------------------------------------

_WS_SPLIT = re.compile(r"\s+")
_ALNUM = re.compile(r"^[a-zA-Z0-9]")


def compact_signature(text: str) -> str:
    out = []
    for tok in _WS_SPLIT.split((text or "").strip()):
        if len(tok) > 2 and _ALNUM.match(tok):
            out.append(tok[0])
    return "".join(out)


def compact_signature_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sigs = [compact_signature(t) for t in batch[text_col].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "signature": pa.array(sigs, pa.string()),
        }
    )


def compact_dedup_groups(ds, id_col: str = "doc_id", text_col: str = "text"):
    """groupby(signature) -> (doc_id=min id, n_members): the crawler's
    near-dup skip (M9/D2) as a shuffle dedup with the declared keep-min
    order."""

    from ray.data.aggregate import Count, Min

    sigs = ds.map_batches(
        lambda b: compact_signature_batch(b, text_col), batch_format="pyarrow"
    )
    agg = sigs.groupby("signature").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_members")
    )
    return agg.select_columns([id_col, "n_members"])


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def word_ngrams(text: str, n: int = 3) -> set[int]:
    toks = _WORD.findall((text or "").lower())
    if len(toks) < n:
        return {zlib.crc32(" ".join(toks).encode())} if toks else set()
    return {
        zlib.crc32(" ".join(toks[i : i + n]).encode())
        for i in range(len(toks) - n + 1)
    }


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.full(a.size, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a*x + b) mod p, vectorized over (perm, shingle)
    vals = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


class MinHashBatch:
    """map_batches stage: text -> (doc_id, bucket) rows, one row per LSH
    band; ``bucket`` is a single int64 key folding (band index, the band's
    signature rows) so bucketing is a plain single-column groupby.

    Defaults (num_perm=64, bands=32 -> 2 rows/band): a true pair at
    jaccard j escapes every band with probability (1 - j^2)^32 — 1e-4 at
    j = 0.5, 4.5e-10 at j = 0.7 — while unrelated docs (j ~ 0.01) become
    false candidates at ~0.3% (filtered by the exact verify).  The exact
    verify makes the OUTPUT equal the capless all-pairs SQL oracle up to
    that band-miss probability.  Signature hashing is multiply-shift
    (a*x + b mod 2^64, a 2-universal family) — no per-element division.
    """

    def __init__(self, num_perm: int = 64, bands: int = 32, ngram: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.ngram = num_perm, bands, ngram
        self.rows_per_band = num_perm // bands
        self.a, self.b = _perm_params(num_perm)
        self.text_col, self.id_col = text_col, id_col

    def _shingle_hashes(self, texts) -> list:
        """Distinct n-gram hashes per doc: tokenization is one Arrow
        regex-split kernel, crc32 runs once per DISTINCT token per batch
        (dictionary encode), and each doc's gram hashes are a wrapping
        linear combination over its token-hash segment view (shifted-slice
        adds) + np.unique — the only Python loop is per DOC.  Only feeds
        the SIGNATURES — the exact verify uses string grams — so the
        gram-hash family only needs to be uniform, not reproduce
        word_ngrams."""
        from .lm import exploded_tokens

        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array(texts, pa.string())
        _, flat, lens = exploded_tokens(texts)
        n = self.ngram
        C = [np.uint64(0x9E3779B97F4A7C15 + 2 * k + 1) for k in range(n)]
        out = []
        if len(flat):
            de = flat.dictionary_encode()
            codes = de.indices.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            base = np.array(
                [zlib.crc32(t.encode()) for t in de.dictionary.to_pylist()],
                dtype=np.uint64,
            )
            th_flat = base[codes]
        else:
            th_flat = np.empty(0, dtype=np.uint64)
        bounds = np.concatenate(([0], np.cumsum(lens)))
        with np.errstate(over="ignore"):
            for i in range(lens.size):
                th = th_flat[bounds[i] : bounds[i + 1]]
                if th.size == 0:
                    out.append(np.empty(0, dtype=np.uint64))
                    continue
                if th.size < n:
                    h = np.uint64(0)
                    for v in th:
                        h = h * C[0] + v
                    out.append(np.array([h], dtype=np.uint64))
                    continue
                m = th.size - n + 1
                acc = np.zeros(m, dtype=np.uint64)
                for k in range(n):
                    acc += th[k : k + m] * C[k]
                out.append(np.unique(acc))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch-vectorized: all docs' shingles go through ONE
        (num_perm × total_shingles) hash pass, then per-doc minima via
        minimum.reduceat; bucket keys are a vectorized uint64 fold — no
        per-doc or per-band Python work."""
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        shingle_lists = self._shingle_hashes(batch[self.text_col])
        lens = np.array([len(s) for s in shingle_lists], dtype=np.int64)
        flat = (
            np.concatenate(shingle_lists)
            if shingle_lists
            else np.empty(0, dtype=np.uint64)
        )
        sigs = np.full((n, self.num_perm), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        nz = lens > 0
        if flat.size:
            with np.errstate(over="ignore"):
                vals = self.a[:, None] * flat[None, :] + self.b[:, None]
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sigs[nz] = np.minimum.reduceat(vals, starts[nz], axis=1).T

        # bucket key: seed with the band index, fold the band's rows with a
        # 64-bit polynomial (wraps); cross-band key collisions can only ADD
        # false candidates (merged buckets), never lose pairs
        P = np.uint64(0x9E3779B97F4A7C15)
        folded = np.broadcast_to(
            (np.arange(self.bands, dtype=np.uint64) + np.uint64(1)) * P,
            (n, self.bands),
        ).copy()
        with np.errstate(over="ignore"):
            for r in range(self.rows_per_band):
                folded = folded * P + sigs[:, r :: self.rows_per_band][:, : self.bands]
        out_id = np.repeat(ids.astype(np.int64), self.bands)
        out_bucket = folded.reshape(-1).view(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "bucket": pa.array(out_bucket, pa.int64()),
            }
        )


def candidate_pairs_from_buckets(group: pa.Table, cap: int = 200) -> pa.Table:
    """Per bucket: emit canonical candidate pairs.  Buckets larger than
    ``cap`` are truncated deterministically (sorted by doc_id) with a
    logged drop — no silent unbounded quadratic blowup.  Truncation only
    affects candidate RECALL (surviving pairs are verified exactly)."""
    ids = sorted(set(group["doc_id"].to_pylist()))
    if len(ids) > cap:
        print(
            f"candidate_pairs_from_buckets: truncating bucket of {len(ids)} "
            f"docs to {cap}"
        )
        ids = ids[:cap]
    m = len(ids)
    if m < 2:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    arr = np.array(ids, dtype=np.int64)
    ii, jj = np.triu_indices(m, k=1)
    return pa.table({"a": pa.array(arr[ii]), "b": pa.array(arr[jj])})


def candidate_pairs_partitioned(group: pa.Table, cap: int = 200) -> pa.Table:
    """Vectorized candidate-pair emission for one COARSE hash partition of
    (doc_id, bucket) rows — all rows of any given bucket land in the same
    partition (the partition key is a hash of the bucket), so this is
    semantically identical to a per-bucket groupby but with ONE Python call
    per partition instead of one per bucket (most buckets are singletons;
    per-group call overhead dominated the wall time at ~10 µs x #buckets).
    Multi-member runs are found with numpy run-length detection; the
    quadratic emit + ``cap`` truncation only runs on those rare runs."""
    b = group["bucket"].to_numpy(zero_copy_only=False)
    d = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )
    if len(b) < 2:
        return empty
    order = np.lexsort((d, b))
    b, d = b[order], d[order]
    keep = np.ones(len(b), dtype=bool)   # drop (bucket, doc) duplicates
    keep[1:] = (b[1:] != b[:-1]) | (d[1:] != d[:-1])
    b, d = b[keep], d[keep]
    starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
    ends = np.r_[starts[1:], len(b)]
    lens = ends - starts
    multi = lens >= 2
    if not multi.any():
        return empty
    out_a, out_b = [], []
    for s, l in zip(starts[multi], lens[multi]):
        ids = d[s : s + int(l)]
        if ids.size > cap:
            print(
                f"candidate_pairs_partitioned: truncating bucket of "
                f"{ids.size} docs to {cap}"
            )
            ids = ids[:cap]
        ii, jj = np.triu_indices(ids.size, k=1)
        out_a.append(ids[ii])
        out_b.append(ids[jj])
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), pa.int64()),
            "b": pa.array(np.concatenate(out_b), pa.int64()),
        }
    )


def _distinct_pairs(pairs_ds):
    """Dataset[(a, b, ...)] -> distinct canonical pairs via a vectorized
    sort-based aggregate (no driver materialization)."""
    from ray.data.aggregate import Count

    return (
        pairs_ds.groupby(["a", "b"])
        .aggregate(Count(alias_name="n_src"))
        .select_columns(["a", "b"])
    )


def _verify_pairs_broadcast(docs_ds, pairs_tbl: pa.Table,
                            cand_ids: np.ndarray, n: int, threshold: float,
                            id_col: str, text_col: str):
    """Small-candidate-set verify: the candidate texts (bounded by the
    caller's cap) are collected once and broadcast via ``ray.put``; the
    deduped pairs are then verified by a shuffle-free ``map_batches`` with a
    per-batch gram cache.  This is the brief's broadcast-small-side-lookup
    pattern — zero all-to-all exchanges."""
    import ray
    import ray.data

    ids_ref = ray.put(cand_ids)

    def sel(batch: pa.Table) -> pa.Table:
        from .prep import sorted_membership_mask

        cids = ray.get(ids_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        batch = batch.filter(pa.array(sorted_membership_mask(cids, ids)))
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                text_col: batch[text_col].cast(pa.string()),
            }
        )

    texts_pd = docs_ds.map_batches(sel, batch_format="pyarrow").to_pandas()
    tids = texts_pd[id_col].to_numpy(np.int64)
    order = np.argsort(tids)
    tref = ray.put((tids[order], texts_pd[text_col].to_numpy()[order]))

    def verify(batch: pa.Table) -> pa.Table:
        t_ids, t_texts = ray.get(tref)
        cache: dict[int, frozenset] = {}

        def grams_of(i: int) -> frozenset:
            g = cache.get(i)
            if g is None:
                pos = np.searchsorted(t_ids, i)
                txt = (
                    t_texts[pos]
                    if pos < t_ids.size and t_ids[pos] == i
                    else ""
                )
                g = frozenset(ngram_strings(txt, n))
                cache[i] = g
            return g

        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_a, out_b, out_j = [], [], []
        for x, y in zip(a, b):
            ga, gb = grams_of(int(x)), grams_of(int(y))
            union = len(ga | gb)
            if union == 0:
                continue
            j = len(ga & gb) / union
            if j >= threshold:
                out_a.append(int(x))
                out_b.append(int(y))
                out_j.append(round(j, 9))
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    pairs = ray.data.from_arrow(pairs_tbl)
    if len(pairs_tbl) > 10_000:
        pairs = pairs.repartition(32)
    return pairs.map_batches(verify, batch_format="pyarrow")


def exact_jaccard_for_pairs(docs_ds, pairs_ds, n: int = 3,
                            threshold: float = 0.5,
                            id_col: str = "doc_id", text_col: str = "text",
                            num_partitions: int = 16,
                            max_filter_ids: int = 5_000_000,
                            max_broadcast_texts: int = 20_000):
    """Distributed exact n-gram Jaccard for candidate pairs.

    Two physical plans, chosen by candidate-set size (the VALUES are
    identical — both compute exact DISTINCT-string-n-gram Jaccard):

    * **broadcast fast path** (distinct candidate ids ≤
      ``max_broadcast_texts``, the overwhelmingly common case — near-dup
      candidates are sparse): candidate texts are collected once,
      broadcast with ``ray.put``, and the deduped pairs verify in a
      shuffle-free ``map_batches``.
    * **distributed fallback** (huge candidate sets): union + double
      groupby —

      1. membership rows  (doc_id, a, b, text=null)   — 2 rows per pair
      2. doc rows         (doc_id, a=null, b=null, text), PRUNED to
         candidate-pair members by a broadcast sorted-id filter when the
         distinct candidate set fits ``max_filter_ids``, so non-candidate
         texts never enter the shuffle; above that cap, all texts shuffle
         (correct, just corpus-sized)
      3. union -> groupby(doc_id): docs with at least one membership
         compute their DISTINCT gram set ONCE and emit (a, b, doc_id,
         gram) rows
      4. groupby(a, b): exact |A∩B| / |A∪B| from the two sides' gram rows

    Jaccard semantics match the all-pairs SQL oracle exactly: DISTINCT
    string n-grams, docs with zero tokens produce no grams, pairs with no
    shared gram (or an empty union) are not emitted.
    """
    n_parts_fused = fused_parts(docs_ds)
    import ray
    import ray.data

    # dedupe to DISTINCT canonical pairs first (one thin sort-based groupby):
    # the LSH band stream repeats a pair once per shared band (up to
    # n_bands x), so gating the broadcast/filter fast paths on the raw row
    # count would prematurely fall back to the corpus-text shuffle, and the
    # membership rows below would be band-duplicated through the exchange
    pairs_ds = _distinct_pairs(pairs_ds).materialize()
    n_pairs = int(pairs_ds.count())
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if n_pairs == 0:
        return ray.data.from_arrow(empty)

    # broadcast sorted candidate ids once (ray.put) unless the set is too
    # big; 2*n_pairs (now distinct pairs) bounds the distinct-id count
    # without an extra pass
    filter_ref = None
    cand_ids = None
    if 2 * n_pairs <= max_filter_ids:
        def batch_ids(batch: pa.Table) -> pa.Table:
            ids = np.unique(
                np.concatenate(
                    [
                        batch["a"].to_numpy(zero_copy_only=False),
                        batch["b"].to_numpy(zero_copy_only=False),
                    ]
                ).astype(np.int64)
            )
            return pa.table({"cid": pa.array(ids, pa.int64())})

        cand_ids = np.unique(
            pairs_ds.map_batches(batch_ids, batch_format="pyarrow")
            .to_pandas()["cid"]
            .to_numpy(np.int64)
        )
        filter_ref = ray.put(cand_ids)
    else:
        print(
            f"exact_jaccard_for_pairs: {n_pairs} candidate pairs exceed the "
            f"id-filter broadcast cap ({max_filter_ids}); shuffling all texts"
        )

    if cand_ids is not None and cand_ids.size <= max_broadcast_texts:
        # pairs are already distinct; driver materialization is bounded by
        # the max_filter_ids gate above
        pairs_pd = pairs_ds.to_pandas()[["a", "b"]]
        pairs_tbl = pa.table(
            {
                "a": pa.array(pairs_pd["a"].to_numpy(np.int64), pa.int64()),
                "b": pa.array(pairs_pd["b"].to_numpy(np.int64), pa.int64()),
            }
        )
        return _verify_pairs_broadcast(
            docs_ds, pairs_tbl, cand_ids, n, threshold, id_col, text_col
        )

    def to_membership(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.concatenate([a, b])
        return pa.table(
            {
                id_col: pa.array(doc, pa.int64()),
                "a": pa.array(np.concatenate([a, a]), pa.int64()),
                "b": pa.array(np.concatenate([b, b]), pa.int64()),
                text_col: pa.nulls(2 * len(a), pa.string()),
            }
        )

    def to_docrows(batch: pa.Table) -> pa.Table:
        if filter_ref is not None:
            from .prep import sorted_membership_mask

            cids = ray.get(filter_ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            batch = batch.filter(pa.array(sorted_membership_mask(cids, ids)))
        m = len(batch)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "a": pa.nulls(m, pa.int64()),
                "b": pa.nulls(m, pa.int64()),
                text_col: batch[text_col].cast(pa.string()),
            }
        )

    mem = pairs_ds.map_batches(to_membership, batch_format="pyarrow")
    docrows = docs_ds.map_batches(to_docrows, batch_format="pyarrow")

    def add_doc_part(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("dpart", pa.array([], pa.int64()))
        d = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("dpart", pa.array(d % n_parts_fused, pa.int64()))

    def per_doc_partition(group: pa.Table) -> pa.Table:
        # one call per coarse doc partition: memberships and doc rows
        # split per doc SEGMENT; gram computation stays the scalar
        # ngram_strings per doc (same <n fallback semantics), only the Ray
        # per-group dispatch is fused away
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "gram": pa.array([], pa.string()),
            }
        )
        if len(group) == 0:
            return empty
        import pyarrow.compute as pc

        doc = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        is_mem = pc.is_valid(group["a"]).to_numpy(zero_copy_only=False)
        a_arr = pc.fill_null(group["a"], -1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        b_arr = pc.fill_null(group["b"], -1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        texts = group[text_col].to_pylist()
        order = np.argsort(doc, kind="stable")
        seg = np.concatenate(
            ([0],
             np.flatnonzero(doc[order][1:] != doc[order][:-1]) + 1,
             [doc.size])
        )
        a_o, b_o, d_o, g_o = [], [], [], []
        for s, e in zip(seg[:-1], seg[1:]):
            rows = order[s:e]
            mem_rows = rows[is_mem[rows]]
            if mem_rows.size == 0:
                continue
            text = next(
                (texts[r] for r in rows if texts[r] is not None), ""
            )
            grams = ngram_strings(text, n)
            g = len(grams)
            if g == 0:
                continue
            a_m = a_arr[mem_rows]
            b_m = b_arr[mem_rows]
            a_o.append(np.repeat(a_m, g))
            b_o.append(np.repeat(b_m, g))
            d_o.append(np.full(mem_rows.size * g, doc[rows[0]], np.int64))
            g_o.extend(grams * mem_rows.size)
        if not g_o:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_o), pa.int64()),
                "b": pa.array(np.concatenate(b_o), pa.int64()),
                id_col: pa.array(np.concatenate(d_o), pa.int64()),
                "gram": pa.array(g_o, pa.string()),
            }
        )

    # Ray's sort shuffle costs scale with block count squared (each map task
    # slices into num-partition ranges); tiny upstream blocks would explode
    # that, so coalesce the union to ``num_partitions`` blocks first.  At
    # 100 TB size num_partitions so one partition's texts fit a worker heap.
    keyed = (
        mem.union(docrows)
        .repartition(num_partitions)
        .map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(per_doc_partition, batch_format="pyarrow")
    )

    def add_pair_part(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("ppart", pa.array([], pa.int64()))
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "ppart", pa.array((a * 1_000_003 + b) % n_parts_fused, pa.int64())
        )

    def per_pair_partition(group: pa.Table) -> pa.Table:
        # one call per coarse pair partition: per-pair set ops run over
        # dictionary CODES within sorted (a, b) segments — no per-pair
        # Ray group and no Python gram-string sets
        if len(group) == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        a = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = group["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        de = group["gram"].combine_chunks().dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((doc, b, a))
        a, b, doc, codes = a[order], b[order], doc[order], codes[order]
        brk = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))
        )
        seg = np.concatenate((np.flatnonzero(brk), [a.size]))
        a_o, b_o, j_o = [], [], []
        for s, e in zip(seg[:-1], seg[1:]):
            pa_id = a[s]
            ga = np.unique(codes[s:e][doc[s:e] == pa_id])
            gb = np.unique(codes[s:e][doc[s:e] != pa_id])
            inter = np.intersect1d(ga, gb, assume_unique=True).size
            union = ga.size + gb.size - inter
            if union == 0:
                continue
            j = inter / union
            if j < threshold:
                continue
            a_o.append(pa_id)
            b_o.append(b[s])
            j_o.append(round(j, 9))
        return pa.table(
            {
                "a": pa.array(a_o, pa.int64()),
                "b": pa.array(b_o, pa.int64()),
                "jaccard": pa.array(j_o, pa.float64()),
            }
        )

    return (
        keyed.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(per_pair_partition, batch_format="pyarrow")
    )


def minhash_lsh_pairs(ds, num_perm: int = 64, bands: int = 32, ngram: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      threshold: float = 0.5, cross_split: int | None = None,
                      precomputed_sigs=None):
    """Full near-dup pipeline: minhash -> LSH buckets -> candidate pairs ->
    DISTRIBUTED exact n-gram Jaccard verify.  Returns a Dataset
    (a, b, jaccard) with jaccard >= threshold, deduped canonical pairs
    (unsorted — callers that need an order sort the small result).

    Partitioning note: Ray's sort-based shuffle pays per (map-block ×
    reduce-partition) slice, so the signature stream is coalesced to a
    row-count-derived partition count before the bucket groupby (tiny
    upstream blocks would otherwise dominate wall time); per-bucket work
    itself is O(bucket²) only for multi-member buckets, capped + logged.
    Candidate pairs are deduped with a sort-based groupby and verified by
    shuffling pair membership against the corpus texts
    (``exact_jaccard_for_pairs``); pair/text rows never collect on the
    driver.  With default band parameters the output equals the exact
    all-pairs jaccard join (ngram_jaccard SQL oracle) up to the
    (1 - j^2)^bands band-miss probability per pair.
    """
    sig = (
        precomputed_sigs
        if precomputed_sigs is not None  # persisted-state incremental path
        else ds.map_batches(
            MinHashBatch(num_perm, bands, ngram, text_col, id_col),
            batch_format="pyarrow",
        )
    ).materialize()
    # ~500k signature rows (a few MB) per shuffle partition
    nparts = max(4, int(sig.count()) // 500_000 + 1)
    if sig.num_blocks() > 2 * nparts:
        sig = sig.repartition(nparts)

    # no _distinct_pairs shuffle here: a pair can repeat once per shared
    # band (<= bands times), and the exact verify collapses duplicates for
    # free (driver drop_duplicates on the broadcast path, set-based gram
    # rows on the distributed path) — cheaper than an extra all-to-all
    # (the ngram path DOES dedup: gram buckets repeat a pair per shared
    # gram, an unbounded multiplicity).
    # Bucket grouping is COARSE: group on a 32-way hash of the bucket and
    # detect per-bucket runs vectorized inside each partition — one Python
    # call per partition instead of one per bucket (most buckets are
    # singletons; per-group call overhead dominated wall time).
    def add_cpart(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            cp = (
                (b.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(59)
            ).astype(np.int32)
        return batch.append_column("cpart", pa.array(cp, pa.int32()))

    cands = (
        sig.map_batches(add_cpart, batch_format="pyarrow")
        .groupby("cpart")
        .map_groups(candidate_pairs_partitioned, batch_format="pyarrow")
    )
    if cross_split is not None:
        # incremental-ingest mode (minhash_delta_pairs): only BASE x DELTA
        # pairs survive — within-corpus pairs are dropped BEFORE the exact
        # verify, so re-ingesting a delta never re-verifies the base
        # against itself (pair ids are emitted ascending, so a < split <= b
        # is the full cross condition)
        split = int(cross_split)

        def cross_only(batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array((a < split) & (b >= split)))

        cands = cands.map_batches(cross_only, batch_format="pyarrow")
    return exact_jaccard_for_pairs(
        ds, cands, n=ngram, threshold=threshold,
        id_col=id_col, text_col=text_col,
        num_partitions=nparts,
    )


def write_minhash_state(ds, out_dir: str, *, num_perm: int = 64,
                        bands: int = 32, ngram: int = 3,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Persist a corpus's LSH signature rows (``(id, bucket)`` per band)
    as partitioned parquet — signatures are a pure function of the text,
    so an incremental-ingest deployment computes them ONCE per corpus
    and every later :func:`minhash_delta_pairs` run re-reads them
    instead of re-hashing the (huge) base.  A ``_PARAMS`` file pins the
    (num_perm, bands, ngram) family; readers assert it matches."""
    import json as _json

    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    (
        ds.map_batches(
            MinHashBatch(num_perm, bands, ngram, text_col, id_col),
            batch_format="pyarrow",
        ).write_parquet(out_dir)
    )
    with open(os.path.join(out_dir, "_PARAMS"), "w") as f:
        _json.dump({"num_perm": num_perm, "bands": bands,
                    "ngram": ngram, "id_col": id_col}, f)
    return out_dir


def minhash_delta_pairs(base_ds, delta_ds, *, offset: int = 1_000_000_000,
                        num_perm: int = 64, bands: int = 32, ngram: int = 3,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.5,
                        base_sigs_dir: str | None = None):
    """Incremental-ingest near-dup detection: pairs BETWEEN an existing
    base corpus and a newly arriving delta only (the 100 TB ingest-time
    dedup op — a delta of new documents is screened against the corpus
    without re-verifying the base against itself).

    Delta ids are shifted by ``offset`` into a disjoint id range, both
    corpora stream through ONE signature/bucket pass, and candidate pairs
    are filtered to base x delta before the exact verify
    (minhash_lsh_pairs cross_split).  Returns (a, b, jaccard) with
    ``a`` = base id, ``b`` = offset + delta id.

    With ``base_sigs_dir`` (written by :func:`write_minhash_state`) the
    base corpus is NEVER re-hashed: its persisted signature rows are
    re-read and only the delta streams through MinHashBatch — signatures
    are a pure function of the text, so this is exactly the incremental
    deployment shape (base texts are still consulted, but only for the
    candidate ids the exact verify pulls).
    """
    import json as _json

    import pyarrow.compute as pc
    import ray.data

    off = int(offset)

    def shift(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(id_col)
        return batch.set_column(
            i, id_col, pc.add(batch[id_col].cast(pa.int64()), off)
        )

    delta_shifted = delta_ds.map_batches(shift, batch_format="pyarrow")
    union = base_ds.union(delta_shifted)
    sigs = None
    if base_sigs_dir is not None:
        with open(os.path.join(base_sigs_dir, "_PARAMS")) as f:
            params = _json.load(f)
        assert params == {"num_perm": num_perm, "bands": bands,
                          "ngram": ngram, "id_col": id_col}, (
            "persisted minhash state was written with a different "
            f"signature family: {params}")
        sigs = ray.data.read_parquet(
            base_sigs_dir, file_extensions=["parquet"]
        ).union(delta_shifted.map_batches(
            MinHashBatch(num_perm, bands, ngram, text_col, id_col),
            batch_format="pyarrow",
        ))
    return minhash_lsh_pairs(
        union, num_perm=num_perm, bands=bands, ngram=ngram,
        text_col=text_col, id_col=id_col, threshold=threshold,
        cross_split=off, precomputed_sigs=sigs,
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard all-pairs (set-similarity join via gram inverted index)
# ---------------------------------------------------------------------------

def ngram_strings(text: str, n: int = 3) -> list[str]:
    """DISTINCT word n-grams as strings (SQL-reproducible variant of
    word_ngrams: same token stream + same <n fallback, no hashing)."""
    toks = _WORD.findall((text or "").lower())
    if not toks:
        return []
    if len(toks) < n:
        return [" ".join(toks)]
    return sorted({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})


def ngram_jaccard_pairs(ds, n: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text",
                        bucket_cap: int = 200, measure: str = "jaccard"):
    """All-pairs n-gram Jaccard >= threshold via the count-based exact
    plan: explode DISTINCT grams (with each doc's gram-set size attached),
    emit co-occurring pairs per gram bucket, and count shared grams in the
    SAME groupby that dedups the pairs.  When no bucket capped anywhere,
    that count c is exactly |A ∩ B| and jaccard = c / (na + nb - c) —
    no document text is ever re-read or re-shuffled for verification.

    ``measure="containment"`` scores Broder CONTAINMENT instead —
    c / min(|A|, |B|) — the asymmetric near-dup measure that catches a
    short document embedded in a long one (jaccard dilutes those).  It
    rides the identical count-based plan; only the final division
    changes.  Containment requires the exact-count regime (no capped
    buckets) because the text-verify fallback recomputes jaccard only.

    Scale notes: the per-gram pair fan-out is quadratic in bucket size, so
    buckets above ``bucket_cap`` (ultra-common grams — the same head-term
    skew as A3) are dropped with a log line AND flagged with a meta row;
    any capped bucket means c may undercount for pairs that also shared
    the capped gram, so the run falls back to the distributed exact text
    verify for all candidates (values stay exact in both branches —
    capping can only lower candidate RECALL, with the same guarantee as
    before: a pair is lost only if EVERY gram it shares is that common).
    """
    n_parts_fused = fused_parts(ds)

    def explode(batch: pa.Table) -> pa.Table:
        # vectorized distinct-gram explode (same stream as ngram_strings:
        # lowered [a-z0-9_]+ tokens, whole-doc join fallback when < n)
        import pyarrow.compute as pc

        from .lm import exploded_tokens
        from .lm import ngram_strings as _tok_ngrams

        doc_pos, flat, lens = exploded_tokens(batch[text_col])
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        grams, starts = _tok_ngrams(doc_pos, flat, n)
        occ = pa.table(
            {
                "doc_id": pa.array(doc_ids[doc_pos[starts]], pa.int64()),
                "gram": grams,
            }
        ).group_by(["doc_id", "gram"]).aggregate([])
        short = (lens > 0) & (lens < n)
        if short.any():
            lists = pa.ListArray.from_arrays(
                pa.array(np.concatenate(([0], np.cumsum(lens))), pa.int32()),
                flat,
            )
            fb_mask = pa.array(short)
            fb = pa.table(
                {
                    "doc_id": pa.array(doc_ids[short], pa.int64()),
                    "gram": pc.binary_join(lists.filter(fb_mask), " "),
                }
            )
            occ = pa.concat_tables([occ.select(["doc_id", "gram"]), fb])
        occ = occ.select(["doc_id", "gram"])
        # attach each doc's distinct-gram-set SIZE (complete here: a doc's
        # text is processed in exactly one batch) — it rides the pair rows
        # so the count-based exact jaccard needs no size join later
        ids_arr = occ["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv, counts = np.unique(
            ids_arr, return_inverse=True, return_counts=True
        )
        return occ.append_column(
            "n_doc", pa.array(counts[inv], pa.int64())
        )

    def add_part(batch: pa.Table) -> pa.Table:
        # coarse hash partition of the gram key: all rows of a gram land in
        # one partition, so per-gram pair emission below is semantically a
        # groupby(gram) — but with ONE Python call per PARTITION instead of
        # one per gram (most grams are singletons; per-group call overhead
        # dominated the wall time, same fix as candidate_pairs_partitioned)
        if len(batch) == 0:
            return batch.append_column("part", pa.array([], pa.int64()))
        de = batch["gram"].combine_chunks().dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        base = np.array(
            [zlib.crc32(g.encode()) for g in de.dictionary.to_pylist()],
            dtype=np.int64,
        )
        return batch.append_column(
            "part", pa.array(base[codes] % n_parts_fused, pa.int64())
        )

    def emit_pairs_partition(group: pa.Table) -> pa.Table:
        # vectorized per-partition: sort rows by (gram, doc), slice gram
        # segments, emit triu pairs (with both docs' set sizes) only for
        # the FEW multi-doc grams; a capped bucket emits ONE meta row
        # (a = -1) so the driver knows the count-based jaccard may
        # undercount and must fall back to the text verify
        de = group["gram"].combine_chunks().dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = group["n_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, codes))
        codes, ids, ns = codes[order], ids[order], ns[order]
        seg_start = np.concatenate(
            ([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1, [codes.size])
        )
        a_o, b_o, na_o, nb_o = [], [], [], []
        for s, e in zip(seg_start[:-1], seg_start[1:]):
            uniq, first = np.unique(ids[s:e], return_index=True)
            m = uniq.size
            if m < 2:
                continue
            if m > bucket_cap:
                print(
                    f"ngram_jaccard_pairs: dropping gram bucket of size {m}"
                )
                a_o.append(np.array([-1], np.int64))
                b_o.append(np.array([-1], np.int64))
                na_o.append(np.array([m], np.int64))
                nb_o.append(np.array([0], np.int64))
                continue
            un = ns[s:e][first]
            ii, jj = np.triu_indices(m, k=1)
            a_o.append(uniq[ii])
            b_o.append(uniq[jj])
            na_o.append(un[ii])
            nb_o.append(un[jj])
        if not a_o:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "na": pa.array([], pa.int64()),
                    "nb": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_o), pa.int64()),
                "b": pa.array(np.concatenate(b_o), pa.int64()),
                "na": pa.array(np.concatenate(na_o), pa.int64()),
                "nb": pa.array(np.concatenate(nb_o), pa.int64()),
            }
        )

    from ray.data.aggregate import Count as _Count

    counted = (
        ds.map_batches(explode, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(emit_pairs_partition, batch_format="pyarrow")
        .groupby(["a", "b", "na", "nb"])
        .aggregate(_Count(alias_name="c"))
        .materialize()
    )
    n_capped = counted.filter(expr="a < 0").count()
    if n_capped == 0:
        # no bucket capped anywhere -> the shared-gram count c IS the exact
        # |A ∩ B| (every shared gram's bucket emitted), so jaccard =
        # c / (na + nb - c) needs NO text re-processing at all
        def score(batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            na = batch["na"].to_numpy(zero_copy_only=False).astype(np.float64)
            nb = batch["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
            c = batch["c"].to_numpy(zero_copy_only=False).astype(np.float64)
            if measure == "containment":
                j = c / np.minimum(na, nb)
            else:
                j = c / (na + nb - c)
            keep = j >= threshold
            return pa.table(
                {
                    "a": pa.array(a[keep], pa.int64()),
                    "b": pa.array(b[keep], pa.int64()),
                    measure: pa.array(
                        [round(float(x), 9) for x in j[keep]], pa.float64()
                    ),
                }
            )

        return counted.map_batches(score, batch_format="pyarrow")

    # a capped bucket means c may UNDERCOUNT |A ∩ B| for pairs that also
    # share a capped gram — fall back to the exact distributed text verify
    # for every candidate (today's 100 TB head-gram path)
    if measure != "jaccard":
        raise ValueError(
            "containment needs the exact-count regime: raise bucket_cap "
            "(a gram bucket exceeded it, so counts may undercount)"
        )
    cands = _distinct_pairs(
        counted.filter(expr="a >= 0").select_columns(["a", "b"])
    )
    return exact_jaccard_for_pairs(
        ds, cands, n=n, threshold=threshold, id_col=id_col, text_col=text_col
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    toks = _WORD.findall((text or "").lower())
    if not toks:
        return 0
    vals, counts = np.unique(
        np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.uint64),
        return_counts=True,
    )
    # spread crc32 to 64 bits deterministically
    h = (vals * np.uint64(0x9E3779B97F4A7C15)) ^ (vals << np.uint64(31))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


class SimHashBatch:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    @staticmethod
    def _simhash_column(texts) -> np.ndarray:
        """Batch-wide simhash64 (integer-exact vs the scalar fn): tokens
        dictionary-encode so crc32 runs once per DISTINCT token per batch;
        the bit-vote accumulates per (doc, token) pair via np.add.at."""
        from .lm import exploded_tokens

        doc_pos, flat, lens = exploded_tokens(texts)
        n_rows = len(lens)
        out = np.zeros(n_rows, dtype=np.uint64)
        if len(flat) == 0:
            return out
        de = flat.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        toks = de.dictionary.to_pylist()
        base = np.array(
            [zlib.crc32(t.encode()) for t in toks], dtype=np.uint64
        )
        h = (base * np.uint64(0x9E3779B97F4A7C15)) ^ (
            base << np.uint64(31)
        )
        bits = (
            (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int64)
        votes = bits * 2 - 1  # (n_dict, 64)
        # Σ over distinct tokens of count×vote == Σ over OCCURRENCES of
        # the vote, so accumulate per doc-major segment (vectorized inner
        # gather+sum; the only Python loop is per DOC)
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        bounds = np.concatenate(([0], np.cumsum(lens)))
        for i in range(n_rows):
            lo, hi = bounds[i], bounds[i + 1]
            if lo == hi:
                continue
            acc = votes[codes[lo:hi]].sum(axis=0)
            out[i] = ((acc > 0).astype(np.uint64) * weights).sum(
                dtype=np.uint64
            )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        hs = self._simhash_column(batch[self.text_col])
        n = len(ids)
        bands = np.tile(np.arange(4, dtype=np.int32), n)
        rep_ids = np.repeat(ids, 4)
        rep_h = np.repeat(hs, 4)
        keys = (
            rep_h >> (np.uint64(16) * bands.astype(np.uint64))
        ) & np.uint64(0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(rep_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_key": pa.array(keys.astype(np.int64), pa.int64()),
                "simhash": pa.array(rep_h, pa.uint64()),
            }
        )


def simhash_pairs(ds, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id"):
    """SimHash near-dup: band-bucket candidates, verify hamming distance
    inside the bucket, dedup across bands with a sort-based groupby —
    returns a Dataset (a, b, hamming) sorted by (a, b); no stage
    materializes pairs on the driver."""
    n_parts_fused = fused_parts(ds)
    sig = ds.map_batches(SimHashBatch(text_col, id_col), batch_format="pyarrow")

    def add_bpart(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("bpart", pa.array([], pa.int64()))
        band = batch["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = batch["band_key"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return batch.append_column(
            "bpart", pa.array((key * 4 + band) % n_parts_fused, pa.int64())
        )

    def bucket_pairs_partition(group: pa.Table) -> pa.Table:
        # one call per coarse bucket partition; per-BUCKET semantics
        # (dedup, deterministic truncation at 50, pairwise hamming) are
        # preserved exactly within each sorted (band, band_key) segment
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int32()),
            }
        )
        if len(group) == 0:
            return empty
        band = group["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = group["band_key"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = group["simhash"].to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        order = np.lexsort((hs, ids, key, band))
        band, key, ids, hs = band[order], key[order], ids[order], hs[order]
        brk = np.concatenate(
            ([True], (band[1:] != band[:-1]) | (key[1:] != key[:-1]))
        )
        seg = np.concatenate((np.flatnonzero(brk), [band.size]))
        a_o, b_o, d_o = [], [], []
        for s, e in zip(seg[:-1], seg[1:]):
            # distinct (doc, hash) rows, already sorted
            sid, sh = ids[s:e], hs[s:e]
            keep = np.concatenate(
                ([True], (sid[1:] != sid[:-1]) | (sh[1:] != sh[:-1]))
            )
            sid, sh = sid[keep], sh[keep]
            if sid.size > 50:
                print(
                    f"simhash_pairs: truncating bucket of {sid.size} docs to 50"
                )
                sid, sh = sid[:50], sh[:50]
            for i in range(sid.size):
                for j in range(i + 1, sid.size):
                    dist = bin(int(sh[i]) ^ int(sh[j])).count("1")
                    if dist <= max_hamming:
                        a_o.append(sid[i])
                        b_o.append(sid[j])
                        d_o.append(dist)
        if not a_o:
            return empty
        return pa.table(
            {
                "a": pa.array(a_o, pa.int64()),
                "b": pa.array(b_o, pa.int64()),
                "hamming": pa.array(d_o, pa.int32()),
            }
        )

    pairs = (
        sig.map_batches(add_bpart, batch_format="pyarrow")
        .groupby("bpart")
        .map_groups(bucket_pairs_partition, batch_format="pyarrow")
    )

    # hamming is pair-determined (same value from every band that emitted
    # the pair), so a native Min aggregate dedups across bands exactly —
    # no per-pair Python call
    from ray.data.aggregate import Min

    return (
        pairs.groupby(["a", "b"])
        .aggregate(Min("hamming", alias_name="hamming"))
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("hamming"),
                "hamming",
                t["hamming"].cast(pa.int32()),
            ) if "hamming" in t.column_names else pa.table(
                {"a": pa.array([], pa.int64()),
                 "b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int32())}),
            batch_format="pyarrow",
        )
        .sort(["a", "b"])
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (bucket-first LSH; no full-matrix broadcast)
# ---------------------------------------------------------------------------

class HyperplaneBandBatch:
    """map_batches stage: one row per (band, bucket_key) per vector — the
    random-hyperplane analog of MinHash banding.  ``n_bands`` bands of
    ``band_bits`` sign bits each; two vectors collide in a band with
    probability (1 - theta/pi)^band_bits, so near-dups (small theta) land
    in a shared bucket in at least one band w.h.p."""

    def __init__(self, dim: int, n_bands: int = 16, band_bits: int = 8,
                 seed: int = 17, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_bands * band_bits, dim))
        self.n_bands, self.band_bits = n_bands, band_bits
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .similarity import _batch_matrix

        m = _batch_matrix(batch, self.vec_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        signs = (m @ self.planes.T) > 0        # (n, n_bands*band_bits)
        n = signs.shape[0]
        weights = 1 << np.arange(self.band_bits, dtype=np.int64)
        keys = np.empty((n, self.n_bands), dtype=np.int64)
        for band in range(self.n_bands):
            seg = signs[:, band * self.band_bits : (band + 1) * self.band_bits]
            keys[:, band] = seg @ weights
        # carry the vector so the within-bucket verify needs no second read:
        # an inherent x n_bands payload amplification through the shuffle
        # (bounded, and still no full-matrix broadcast) — tiled as a flat
        # float64 FixedSizeList, never as Python lists
        dim = m.shape[1]
        flat = np.tile(np.ascontiguousarray(m, dtype=np.float64).reshape(-1),
                       self.n_bands)
        vec_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, pa.float64()), dim
        )
        return pa.table(
            {
                "band": pa.array(
                    np.repeat(np.arange(self.n_bands, dtype=np.int32), n),
                    pa.int32(),
                ),
                "bucket": pa.array(keys.T.reshape(-1), pa.int64()),
                self.id_col: pa.array(np.tile(ids, self.n_bands), pa.int64()),
                self.vec_col: vec_arr,
            }
        )


def embedding_near_dup_pairs(ds, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_bands: int = 16, band_bits: int = 8,
                             seed: int = 17, bucket_cap: int = 2000):
    """Cosine near-dup over an embedding column — bucket-first: hyperplane
    LSH bands assign each vector to ``n_bands`` buckets, the exact cosine
    matmul runs only WITHIN each (band, bucket) group, and cross-band
    duplicates collapse with a sort-based groupby.  No stage materializes
    or broadcasts the corpus matrix.

    Recall at the 0.95 threshold (theta ~ 18°, p_bit ~ 0.9): a true pair
    misses every band with probability (1 - 0.9^band_bits)^n_bands ~ 1e-4
    at the defaults; planted near-identical pairs (cosine > 0.99) miss with
    probability < 1e-6.  Returns a Dataset (a, b, cosine) sorted by (a, b).
    """
    n_parts_fused = fused_parts(ds)
    dim = len(ds.take(1)[0][vec_col])
    bucketed = ds.map_batches(
        HyperplaneBandBatch(dim, n_bands, band_bits, seed, vec_col, id_col),
        batch_format="pyarrow",
    )

    def add_bpart(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("bpart", pa.array([], pa.int64()))
        band = batch["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "bpart", pa.array((bkt * 31 + band) % n_parts_fused, pa.int64())
        )

    def bucket_pairs_partition(group: pa.Table) -> pa.Table:
        # one call per coarse bucket partition; per-BUCKET dedupe /
        # truncation / matmul semantics preserved within each sorted
        # (band, bucket) segment, vectors decoded once per partition
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(group) == 0:
            return empty
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        band = group["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = group["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        from .similarity import _batch_matrix

        vecs = _batch_matrix(group, vec_col)
        order = np.lexsort((ids, bkt, band))
        ids, band, bkt = ids[order], band[order], bkt[order]
        vecs = vecs[order]
        brk = np.concatenate(
            ([True], (band[1:] != band[:-1]) | (bkt[1:] != bkt[:-1]))
        )
        seg = np.concatenate((np.flatnonzero(brk), [ids.size]))
        out = []
        for s, e in zip(seg[:-1], seg[1:]):
            sid = ids[s:e]
            keep_u = np.concatenate(([True], sid[1:] != sid[:-1]))
            sel = np.flatnonzero(keep_u) + s
            sid = sid[keep_u]
            if sid.size > bucket_cap:
                print(
                    f"embedding_near_dup_pairs: truncating bucket of "
                    f"{sid.size} vectors to {bucket_cap}"
                )
                sel, sid = sel[:bucket_cap], sid[:bucket_cap]
            if sid.size < 2:
                continue
            m = vecs[sel]
            m = m / np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-12
            )
            sims = m @ m.T
            ii, jj = np.triu_indices(sid.size, k=1)
            vals = sims[ii, jj]
            keep = vals >= threshold
            if keep.any():
                # ids sorted ascending and ii < jj, so a < b canonically
                out.append((sid[ii[keep]], sid[jj[keep]], vals[keep]))
        if not out:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate([o[0] for o in out]), pa.int64()),
                "b": pa.array(np.concatenate([o[1] for o in out]), pa.int64()),
                "cosine": pa.array(
                    np.concatenate([o[2] for o in out]), pa.float64()
                ),
            }
        )

    pairs = (
        bucketed.map_batches(add_bpart, batch_format="pyarrow")
        .groupby("bpart")
        .map_groups(bucket_pairs_partition, batch_format="pyarrow")
    )

    # cosine is pair-determined, so Min dedups across bands exactly
    from ray.data.aggregate import Min

    return (
        pairs.groupby(["a", "b"])
        .aggregate(Min("cosine", alias_name="cosine"))
        .sort(["a", "b"])
    )


# ---------------------------------------------------------------------------
# connected-components clustering over near-dup pairs
# ---------------------------------------------------------------------------

def near_dup_clusters(pairs_ds, max_iter: int = 10_000,
                      method: str = "propagate"):
    """Transitive near-dup clusters from a pair Dataset (a, b): min-label
    propagation run to FIXPOINT — each round every node adopts the minimum
    label among itself and its neighbors, and the min label travels one hop
    per round, so convergence takes up to the component diameter rounds
    (label-sum fixpoint detection stops early).  ``max_iter`` is a runaway
    backstop; hitting it RAISES rather than silently returning unconverged
    labels (they would diverge from the transitive-closure SQL oracle).

    Rounds are Dataset groupbys; returns a Dataset (node, cluster) where
    cluster = min doc_id of the component.  Scale note: diameter-bound
    rounds are fine for near-dup graphs (components are overwhelmingly
    cliques/short chains); for long-chain / general graphs pass
    ``method="pointer_doubling"`` — O(log diameter) rounds (each round adds
    a label-jump exchange, so it costs ~1.5x a propagate round but a
    1000-chain converges in ~11 rounds instead of ~1000).
    """
    if method == "pointer_doubling":
        return _clusters_pointer_doubling(pairs_ds, max_iter)[0]
    if method != "propagate":
        raise ValueError(f"unknown method {method!r}")
    import ray.data
    from ray.data.aggregate import Min, Sum

    def seed_labels(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, b])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "cluster": pa.array(node, pa.int64()),
            }
        )

    pairs_m = pairs_ds.materialize()

    labels = (
        pairs_m.map_batches(seed_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("cluster", alias_name="cluster"))
        .materialize()
    )
    if labels.count() == 0:
        return labels

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), pa.int64()),
                "edge_other": pa.array(np.concatenate([b, a]), pa.int64()),
                "cluster": pa.nulls(2 * len(a), pa.int64()),
            }
        )

    edges = pairs_m.map_batches(to_edges, batch_format="pyarrow").materialize()

    def to_node_label(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "edge_other": pa.nulls(len(batch), pa.int64()),
                "cluster": batch["cluster"],
            }
        )

    def propagate(group: pa.Table) -> pa.Table:
        labs = [c for c in group["cluster"].to_pylist() if c is not None]
        lab = int(min(labs))
        others = [int(o) for o in group["edge_other"].to_pylist() if o is not None]
        node = int(group["node"][0].as_py())
        out_nodes = [node] + others
        return pa.table(
            {
                "node": pa.array(out_nodes, pa.int64()),
                "cluster": pa.array([lab] * len(out_nodes), pa.int64()),
            }
        )

    prev_sum = labels.aggregate(Sum("cluster", alias_name="s"))["s"]

    for it in range(max_iter):
        msgs = (
            labels.map_batches(to_node_label, batch_format="pyarrow")
            .union(edges)
            .groupby("node")
            .map_groups(propagate, batch_format="pyarrow")
        )
        labels = (
            msgs.groupby("node")
            .aggregate(Min("cluster", alias_name="cluster"))
            .materialize()
        )
        cur_sum = labels.aggregate(Sum("cluster", alias_name="s"))["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"near_dup_clusters: no fixpoint within max_iter={max_iter} "
            f"rounds (component diameter exceeds the backstop)"
        )
    return labels


def _clusters_pointer_doubling(pairs_ds, max_iter: int = 10_000):
    """Min-label CC with POINTER DOUBLING (label-jumping): each round first
    relaxes one hop (every node takes the min label over itself + its
    neighbors, as in the propagate method), then JUMPS every node's label to
    its label's label — L(v) <- L(L(v)) — halving the remaining distance to
    the component minimum, so convergence takes O(log diameter) rounds (the
    classic MapReduce-CC shortcutting; public algorithm, e.g. Kiveris et al.
    "Connected Components in MapReduce and Beyond").

    Invariant kept by both steps: L(v) is the id of a node in v's component
    and L(v) >= component minimum — so the label-sum fixpoint equals the
    propagate method's output exactly.  All exchanges are Dataset groupbys;
    the jump is the union-of-(request, carrier)-rows pattern (no joins).

    Returns (labels Dataset, rounds executed) — the round count backs the
    O(log diameter) test."""
    import ray.data
    from ray.data.aggregate import Min, Sum

    def seed_labels(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, b])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "cluster": pa.array(node, pa.int64()),
            }
        )

    pairs_m = pairs_ds.materialize()
    labels = (
        pairs_m.map_batches(seed_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("cluster", alias_name="cluster"))
        .materialize()
    )
    if labels.count() == 0:
        return labels, 0

    # group by a COARSE hash partition (part = node % P), not per node: the
    # per-group Python emit would cost one call per node per round and
    # fragment labels into one-row blocks (measured: ~770 tasks PER STAGE
    # on a 1000-node chain); inside a partition everything is a vectorized
    # searchsorted against that partition's label rows
    n_parts = max(8, int(labels.count()) // 500_000)

    def to_msgs(batch: pa.Table) -> pa.Table:
        # each edge (a, b) will deliver L(a) to b and L(b) to a; encoded as
        # stub rows colocated with the LABEL OWNER's partition
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, b])
        return pa.table(
            {
                "part": pa.array(node % n_parts, pa.int64()),
                "node": pa.array(node, pa.int64()),
                "dest": pa.array(np.concatenate([b, a]), pa.int64()),
                "cluster": pa.nulls(2 * len(a), pa.int64()),
            }
        )

    edge_msgs = pairs_m.map_batches(to_msgs, batch_format="pyarrow").materialize()

    def label_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "node" not in batch.column_names:
            return pa.table({"part": pa.array([], pa.int64()),
                             "node": pa.array([], pa.int64()),
                             "dest": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        node = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(node % n_parts, pa.int64()),
                "node": batch["node"].cast(pa.int64()),
                "dest": pa.nulls(len(batch), pa.int64()),
                "cluster": batch["cluster"].cast(pa.int64()),
            }
        )

    def _lookup(sorted_keys: np.ndarray, vals: np.ndarray,
                query: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(sorted_keys, query)
        if idx.size and (idx.max() >= sorted_keys.size
                         or not np.array_equal(sorted_keys[idx], query)):
            raise AssertionError("pointer-doubling invariant broken: "
                                 "label row missing for a referenced node")
        return vals[idx]

    def relax_part(group: pa.Table) -> pa.Table:
        # one partition: its label rows + the edge stubs of its nodes.
        # Forward each stub node's label to the stub's dest, keep labels
        # for self — all via one searchsorted against the label rows.
        # (validity masks + fill_null keep int64 exact; a NaN-float
        # conversion would corrupt >2^53 ids)
        import pyarrow.compute as pc

        is_stub = pc.is_valid(group["dest"].combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        dest = (
            group["dest"].combine_chunks().fill_null(0)
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        node = group["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        cluster = (
            group["cluster"].combine_chunks().fill_null(0)
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        ln, lc = node[~is_stub], cluster[~is_stub]
        order = np.argsort(ln, kind="stable")
        ln, lc = ln[order], lc[order]
        sn = node[is_stub]
        sd = dest[is_stub]
        lab = _lookup(ln, lc, sn)
        return pa.table(
            {
                "node": pa.array(np.concatenate([ln, sd]), pa.int64()),
                "cluster": pa.array(np.concatenate([lc, lab]), pa.int64()),
            }
        )

    def jump_requests(batch: pa.Table) -> pa.Table:
        # request rows keyed by the node's CURRENT label (asking for L(L(v)))
        key = batch["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(key % n_parts, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "req": batch["node"].cast(pa.int64()),
                "cluster": pa.nulls(len(batch), pa.int64()),
            }
        )

    def jump_carriers(batch: pa.Table) -> pa.Table:
        key = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(key % n_parts, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "req": pa.nulls(len(batch), pa.int64()),
                "cluster": batch["cluster"].cast(pa.int64()),
            }
        )

    def jump_part(group: pa.Table) -> pa.Table:
        # resolve L(L(v)) for every request against this partition's
        # carrier rows (one row per label-owner node)
        import pyarrow.compute as pc

        is_req = pc.is_valid(group["req"].combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        req = (
            group["req"].combine_chunks().fill_null(0)
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        key = group["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        cluster = (
            group["cluster"].combine_chunks().fill_null(0)
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        kn, kc = key[~is_req], cluster[~is_req]
        order = np.argsort(kn, kind="stable")
        kn, kc = kn[order], kc[order]
        rk = key[is_req]
        rq = req[is_req]
        lab = _lookup(kn, kc, rk)
        return pa.table(
            {
                "node": pa.array(rq, pa.int64()),
                "cluster": pa.array(lab, pa.int64()),
            }
        )

    prev_sum = labels.aggregate(Sum("cluster", alias_name="s"))["s"]
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # the trailing repartition(n_parts) is load-bearing: groupby output
        # partition counts track INPUT block counts, so without a coalesce
        # each round's unions/groupbys multiply blocks and task counts
        # snowball round-over-round (measured: the 1000-node chain went
        # from ~40 s to >10 min without it)
        relaxed = (
            labels.map_batches(label_rows, batch_format="pyarrow")
            .union(edge_msgs)
            .groupby("part")
            .map_groups(relax_part, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("cluster", alias_name="cluster"))
            .repartition(n_parts)
            .materialize()
        )
        labels = (
            relaxed.map_batches(jump_requests, batch_format="pyarrow")
            .union(relaxed.map_batches(jump_carriers, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(jump_part, batch_format="pyarrow")
            .repartition(n_parts)
            .materialize()
        )
        cur_sum = labels.aggregate(Sum("cluster", alias_name="s"))["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"near_dup_clusters(pointer_doubling): no fixpoint within "
            f"max_iter={max_iter} rounds"
        )
    return labels, rounds


# ---------------------------------------------------------------------------
# exact-substring duplicate spans (Lee et al. 2021, "Deduplicating Training
# Data Makes Language Models Better" — public method, re-expressed as a
# gram-shuffle instead of a suffix array)
# ---------------------------------------------------------------------------

def _ngram_hashes_u64(doc_pos: np.ndarray, flat: pa.Array, n: int):
    """u64 polynomial hash per same-doc token ``n``-gram, with the flat
    position of each gram's first token — the 8-bytes-per-key shuffle
    representation for :func:`dup_spans` at 100 TB.  Token hash = two
    decorrelated crc32s packed into 64 bits (deterministic across
    processes); gram hash = Σ tokhash[i+j]·P^j mod 2^64 (FNV prime), all
    vectorized (n vector ops, no gram strings ever built)."""
    total = len(flat)
    if total < n:
        return np.array([], np.int64), np.array([], np.int64)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    de = flat.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    toks = [t.encode() for t in de.dictionary.to_pylist()]
    h = np.array([zlib.crc32(t) for t in toks], dtype=np.uint64)
    # splitmix64 finalizer spreads the 32-bit crc over 64 bits (vectorized)
    with np.errstate(over="ignore"):
        z = h * np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    tokh = z[codes]
    valid = doc_pos[: total - n + 1] == doc_pos[n - 1 :]
    width = total - n + 1
    acc = np.zeros(width, dtype=np.uint64)
    mult = np.uint64(1)
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for j in range(n):
            acc += tokh[j : j + width] * mult
            mult = mult * prime
    return acc[valid].view(np.int64), np.flatnonzero(valid)


def dup_spans(ds, n: int = 8, id_col: str = "doc_id",
              text_col: str = "text", gram_repr: str = "str"):
    """Find maximal token spans that appear verbatim in MORE THAN ONE doc:
    explode every token ``n``-gram position, keep positions whose gram
    occurs in >= 2 distinct docs, and merge surviving positions per doc
    into maximal spans (two n-token windows merge when their starts are
    within ``n`` of each other, i.e. the windows overlap or touch).
    Returns (doc_id, span_start, span_end, n_dup_grams) with token-index
    spans, span_end exclusive.

    The caller trims ``[span_start, span_end)`` from each doc (keeping one
    canonical copy is a policy layered on top — e.g. keep the span in the
    min doc_id holder by anti-joining the others).

    Scale shape: the gram explode is ~tokens×1 rows and the groupby(gram)
    is THE inherent all-to-all of substring dedup (the suffix-array
    equivalent); output of that stage is only the duplicated positions.
    ``gram_repr="str"`` (default) ships gram STRINGS for exact SQL-oracle
    parity; ``gram_repr="u64"`` is the 100 TB shuffle representation
    (VERDICT r3 #8): grams travel as 8-byte polynomial hashes
    (:func:`_ngram_hashes_u64`) — same shuffle shape at ~8 bytes/row, and
    a hash collision can only ADD a false dup position, so the resulting
    spans are a superset of the string path's (the standard trade).  The
    span merge shuffles thin (doc_id, pos) rows once, grouped by doc.
    """
    if gram_repr not in ("str", "u64"):
        raise ValueError(f"gram_repr must be 'str' or 'u64', got {gram_repr!r}")
    n_parts_fused = fused_parts(ds)

    def explode(batch: pa.Table) -> pa.Table:
        # vectorized position-gram explode + coarse gram partition key
        from .lm import exploded_tokens
        from .lm import ngram_strings as _tok_ngrams

        doc_pos, flat, lens = exploded_tokens(batch[text_col])
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if gram_repr == "u64":
            hashes, starts = _ngram_hashes_u64(doc_pos, flat, n)
            grams = pa.array(hashes, pa.int64())
            part = (
                hashes.view(np.uint64) % np.uint64(n_parts_fused)
            ).astype(np.int64) if len(hashes) else np.empty(0, np.int64)
        else:
            grams, starts = _tok_ngrams(doc_pos, flat, n)
            if len(grams):
                de = grams.combine_chunks().dictionary_encode() if isinstance(
                    grams, pa.ChunkedArray
                ) else grams.dictionary_encode()
                codes = de.indices.to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
                base = np.array(
                    [zlib.crc32(g.encode()) for g in de.dictionary.to_pylist()],
                    dtype=np.int64,
                )
                part = base[codes] % n_parts_fused
            else:
                part = np.empty(0, np.int64)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        gdoc = doc_pos[starts]
        pos = starts - offsets[gdoc]
        return pa.table(
            {
                "gram": grams,
                "doc_id": pa.array(doc_ids[gdoc], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    def dup_positions_partition(group: pa.Table) -> pa.Table:
        # one vectorized call per coarse gram partition: a gram's rows
        # survive iff the gram spans >= 2 distinct docs (min != max doc
        # within its sorted segment)
        if len(group) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "pos": pa.array([], pa.int64())}
            )
        if pa.types.is_integer(group["gram"].type):
            # u64 repr: the hash IS the sortable code, no dict encode
            codes = group["gram"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
        else:
            de = group["gram"].combine_chunks().dictionary_encode()
            codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        docs = group["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        pos = group["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        codes, docs, pos = codes[order], docs[order], pos[order]
        brk = np.concatenate(
            ([True], codes[1:] != codes[:-1])
        )
        seg_starts = np.flatnonzero(brk)
        seg_id = np.cumsum(brk) - 1
        dmin = np.minimum.reduceat(docs, seg_starts)
        dmax = np.maximum.reduceat(docs, seg_starts)
        keep = (dmin != dmax)[seg_id]
        return pa.table(
            {
                "doc_id": pa.array(docs[keep], pa.int64()),
                "pos": pa.array(pos[keep], pa.int64()),
            }
        )

    def merge_spans(group: pa.Table) -> pa.Table:
        g = group.sort_by("pos")
        p = np.unique(g["pos"].to_numpy(zero_copy_only=False).astype(np.int64))
        brk = np.empty(len(p), dtype=bool)
        brk[0] = True
        brk[1:] = p[1:] > p[:-1] + n
        grp = np.cumsum(brk) - 1
        starts = p[brk]
        ends = np.maximum.reduceat(p, np.flatnonzero(brk)) + n
        counts = np.bincount(grp)
        did = group["doc_id"][0].as_py()
        return pa.table(
            {
                "doc_id": pa.array(
                    np.full(len(starts), did, dtype=np.int64), pa.int64()
                ),
                "span_start": pa.array(starts, pa.int64()),
                "span_end": pa.array(ends, pa.int64()),
                "n_dup_grams": pa.array(counts, pa.int64()),
            }
        )

    dups = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dup_positions_partition, batch_format="pyarrow")
    )
    return dups.groupby("doc_id").map_groups(
        merge_spans, batch_format="pyarrow"
    )

"""Deduplication stages for training-data pipelines.

Five dedup families over the ``documents`` / ``embeddings`` tables, each
expressed Ray-Data-first (SURVEY.md §2.7 D1/D2 generalized):

* exact (sha/text hash-partition + per-group keep-min)       — shuffle dedup
* MinHash + LSH (shingle -> minhash -> band -> bucket groupby -> verify
  n-gram Jaccard)                                            — near-dup
* SimHash (64-bit, 16-bit band buckets -> hamming verify)    — near-dup
* n-gram Jaccard verification (the exact pair check used by both)
* embedding cosine (normalized matmul against a broadcast matrix)

All candidate generation is shuffle-based (groupby on bucket keys); only the
small verified-pair sets are materialized.  Pair outputs are canonical
(a < b) and deterministic.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa

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
    """groupby(sha) -> (doc_id=min id, n_dups).  One row per distinct text."""

    def keep_min(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array([int(ids.min())], pa.int64()),
                "n_dups": pa.array([len(ids)], pa.int64()),
            }
        )

    withsha = ds.map_batches(
        lambda b: add_text_sha(b, text_col), batch_format="pyarrow"
    )
    return withsha.groupby("text_sha256").map_groups(
        keep_min, batch_format="pyarrow"
    )


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

    def keep_min(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array([int(ids.min())], pa.int64()),
                "n_members": pa.array([len(ids)], pa.int64()),
            }
        )

    sigs = ds.map_batches(
        lambda b: compact_signature_batch(b, text_col), batch_format="pyarrow"
    )
    return sigs.groupby("signature").map_groups(keep_min, batch_format="pyarrow")


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
    """map_batches stage: text -> (doc_id, band, band_hash) rows (bands
    explode to one row per band so LSH bucketing is a plain groupby)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, ngram: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.ngram = num_perm, bands, ngram
        self.rows_per_band = num_perm // bands
        self.a, self.b = _perm_params(num_perm)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch-vectorized: all docs' shingles go through ONE
        (num_perm × total_shingles) modular-hash pass, then per-doc minima
        via minimum.reduceat — no per-doc matmuls."""
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        n = len(ids)
        shingle_lists = [word_ngrams(t, self.ngram) for t in texts]
        lens = np.array([len(s) for s in shingle_lists], dtype=np.int64)
        flat = np.fromiter(
            (h for s in shingle_lists for h in s),
            dtype=np.uint64,
            count=int(lens.sum()),
        )
        sigs = np.full((n, self.num_perm), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        nz = lens > 0
        if flat.size:
            vals = (self.a[:, None] * flat[None, :] + self.b[:, None]) % _MERSENNE
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sigs[nz] = np.minimum.reduceat(vals, starts[nz], axis=1).T

        out_id, out_band, out_hash = [], [], []
        for i, did in enumerate(ids):
            sig = sigs[i]
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                out_id.append(did)
                out_band.append(band)
                out_hash.append(zlib.crc32(chunk.tobytes()))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )


def candidate_pairs_from_buckets(group: pa.Table, cap: int = 50) -> pa.Table:
    """Per (band, band_hash) bucket: emit canonical candidate pairs.  Buckets
    larger than ``cap`` are truncated deterministically (sorted by doc_id)
    with a logged drop — no silent unbounded quadratic blowup."""
    ids = sorted(set(group["doc_id"].to_pylist()))
    if len(ids) > cap:
        ids = ids[:cap]
    a_out, b_out = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pa.table(
        {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())}
    )


def minhash_lsh_pairs(ds, num_perm: int = 64, bands: int = 16, ngram: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      threshold: float = 0.5):
    """Full near-dup pipeline: minhash -> LSH buckets -> candidate pairs ->
    exact n-gram Jaccard verify.  Returns Dataset (a, b, jaccard) with
    jaccard >= threshold, deduped canonical pairs.

    The verify step re-reads the two texts via a broadcast id->text lookup
    built from the (small) candidate id set; at 100 TB scale this becomes a
    hash-join of candidates against the corpus instead.
    """
    sig = ds.map_batches(
        MinHashBatch(num_perm, bands, ngram, text_col, id_col),
        batch_format="pyarrow",
    )
    pairs = sig.groupby(["band", "band_hash"]).map_groups(
        candidate_pairs_from_buckets, batch_format="pyarrow"
    )
    pair_tbl = pairs.to_pandas().drop_duplicates(["a", "b"])
    if len(pair_tbl) == 0:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )

    need = sorted(set(pair_tbl["a"]) | set(pair_tbl["b"]))
    import ray

    need_ref = ray.put(set(need))

    def collect(batch: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        keep = [i for i, d in enumerate(batch[id_col].to_pylist()) if d in want]
        return batch.take(pa.array(keep, pa.int64())).select([id_col, text_col])

    got = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
    texts = dict(zip(got[id_col], got[text_col]))

    a_o, b_o, j_o = [], [], []
    sh_cache: dict[int, set] = {}
    for a_id, b_id in zip(pair_tbl["a"], pair_tbl["b"]):
        sa = sh_cache.setdefault(a_id, word_ngrams(texts.get(a_id, ""), ngram))
        sb = sh_cache.setdefault(b_id, word_ngrams(texts.get(b_id, ""), ngram))
        sim = jaccard(sa, sb)
        if sim >= threshold:
            a_o.append(int(a_id)); b_o.append(int(b_id)); j_o.append(sim)
    return pa.table(
        {
            "a": pa.array(a_o, pa.int64()),
            "b": pa.array(b_o, pa.int64()),
            "jaccard": pa.array(j_o, pa.float64()),
        }
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
                        bucket_cap: int = 200):
    """All-pairs n-gram Jaccard >= threshold via the gram-inverted-index
    join (PPJoin-style shape, no prefix filter): explode DISTINCT grams,
    groupby(gram) emits co-occurring pairs, groupby(pair) counts the
    intersection, and |A∪B| comes from a broadcast doc->set-size map.

    Scale notes: the per-gram pair fan-out is quadratic in bucket size, so
    buckets above ``bucket_cap`` (ultra-common grams — the same head-term
    skew as A3) are dropped with a log line; a dropped gram can only LOWER
    recall for pairs whose every shared gram is that common, which at
    threshold >= 0.5 effectively never identifies a near-dup on its own.
    The sizes map is one int per doc — broadcast here, a hash join at
    100 TB scale.
    """
    import ray
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        ids, grams = [], []
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            for g in ngram_strings(text, n):
                ids.append(did)
                grams.append(g)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "gram": pa.array(grams, pa.string())}
        )

    grams_ds = ds.map_batches(explode, batch_format="pyarrow")

    sizes_tbl = (
        grams_ds.groupby("doc_id").aggregate(Count(alias_name="n_grams")).to_pandas()
    )
    sizes_ref = ray.put(dict(zip(sizes_tbl["doc_id"], sizes_tbl["n_grams"])))

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group["doc_id"].to_pylist()))
        if len(ids) > bucket_cap:
            print(f"ngram_jaccard_pairs: dropping gram bucket of size {len(ids)}")
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table(
            {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())}
        )

    inter = (
        grams_ds.groupby("gram")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="inter"))
    )

    def score(batch: pa.Table) -> pa.Table:
        sizes = ray.get(sizes_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        c = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = np.array([sizes[x] for x in a], dtype=np.float64)
        nb = np.array([sizes[x] for x in b], dtype=np.float64)
        j = c / (na + nb - c)
        keep = j >= threshold
        return pa.table(
            {
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(np.round(j[keep], 9), pa.float64()),
            }
        )

    return inter.map_batches(score, batch_format="pyarrow")


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        hs = [simhash64(t) for t in batch[self.text_col].to_pylist()]
        out_id, out_band, out_key, out_h = [], [], [], []
        for did, h in zip(ids, hs):
            for band in range(4):  # 4 x 16-bit bands: catches hamming<=3 pairs
                out_id.append(did)
                out_band.append(band)
                out_key.append((h >> (16 * band)) & 0xFFFF)
                out_h.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.int64()),
                "simhash": pa.array(np.array(out_h, dtype=np.uint64), pa.uint64()),
            }
        )


def simhash_pairs(ds, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """SimHash near-dup: band-bucket candidates, verify hamming distance."""
    sig = ds.map_batches(SimHashBatch(text_col, id_col), batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            set(zip(group["doc_id"].to_pylist(), group["simhash"].to_pylist()))
        )[:50]
        a_o, b_o, d_o = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                (ida, ha), (idb, hb) = rows[i], rows[j]
                dist = bin(int(ha) ^ int(hb)).count("1")
                a_o.append(ida); b_o.append(idb); d_o.append(dist)
        return pa.table(
            {
                "a": pa.array(a_o, pa.int64()),
                "b": pa.array(b_o, pa.int64()),
                "hamming": pa.array(d_o, pa.int32()),
            }
        )

    pairs = sig.groupby(["band", "band_key"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    ).to_pandas().drop_duplicates(["a", "b"])
    pairs = pairs[pairs["hamming"] <= max_hamming].sort_values(["a", "b"])
    return pa.Table.from_pandas(pairs.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(ds, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> pa.Table:
    """Cosine near-dup over an embedding column: the full (normalized)
    matrix is broadcast once via ``ray.put`` and every batch computes
    batch x matrix.T — no shuffle.  Scale path (documented): IVF/LSH
    bucketing first, matmul within buckets."""
    import ray

    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = full[id_col].to_numpy()
    mat = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def pairs_batch(batch: pa.Table) -> pa.Table:
        all_ids, m = ray.get(ref)
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        bmat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()]
        )
        bmat /= np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
        sims = bmat @ m.T
        a_o, b_o, s_o = [], [], []
        for r in range(sims.shape[0]):
            hits = np.flatnonzero(sims[r] >= threshold)
            for c in hits:
                if bids[r] < all_ids[c]:  # canonical, drops self-pairs
                    a_o.append(int(bids[r])); b_o.append(int(all_ids[c]))
                    s_o.append(float(sims[r, c]))
        return pa.table(
            {
                "a": pa.array(a_o, pa.int64()),
                "b": pa.array(b_o, pa.int64()),
                "cosine": pa.array(s_o, pa.float64()),
            }
        )

    out = ds.map_batches(pairs_batch, batch_format="pyarrow").to_pandas()
    if out.empty:
        # all-empty blocks can drop the schema on collection
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)

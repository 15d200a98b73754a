"""Engine configuration (replaces the reference's scattered constants:
IndexerConfig.java:3-23, InvertedIndex.java:13-15, Main.java:26-27)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class BuildConfig:
    # --- shuffle layout -----------------------------------------------------
    # segment shard = stable_hash(term) % num_shards: the partitioning key for
    # the posting-list build AND the query-time term -> shard routing function
    # (SURVEY.md §7.3).  Production sizing: thousands; tests: small.
    num_shards: int = 8
    # uniform doc-range salting: every (term, shard) group is further split by
    # the TOP bits of doc_int into 2**salt_bits runs.  Runs are disjoint,
    # ordered doc_int ranges, so a term's full posting list is the
    # concatenation of its runs in salt order — skewed head terms ("import",
    # "return") never exceed ~1/2**salt_bits of the corpus per reduce task,
    # with no head-term detection pre-pass (SURVEY.md §4.2 skew).
    salt_bits: int = 2

    # --- execution ----------------------------------------------------------
    tokenize_batch_size: int = 128
    # coalesce tokenize output to this many blocks before the hash-partitioned
    # postings write: file count per part dir = write blocks, so this bounds
    # total small files at write_blocks x num_parts
    postings_write_blocks: int = 16
    # None -> stateless tasks with a cached global tokenizer; an int builds an
    # actor pool (map_batches(cls, concurrency=N)).
    tokenize_concurrency: int | None = None
    encode_batch_format: str = "pyarrow"

    # --- dedup --------------------------------------------------------------
    # "broadcast_losers": compute duplicate doc_ints (a small set when the
    # dup-rate is modest) and broadcast-filter; "shuffle": full
    # groupby(content_sha) shuffle keeping min doc_id.  SURVEY.md §7.3 D1/D2.
    dedup_strategy: str = "broadcast_losers"
    max_broadcast_losers: int = 5_000_000
    # hash partitions for the exact-dedup storage shuffle; size so one
    # partition's (sha, doc_int) rows fit in a task's heap (~40 B/row)
    dedup_partitions: int = 32

    # --- codec --------------------------------------------------------------
    block_size: int = 128  # block-max metadata granularity (postings/block)
    # posting-stream codec for the FINAL (compacted) segment tier — applies
    # to the docs, tfs and pos_offsets streams (the nested positions
    # payload stays varint):
    # "varint"  — delta-gap varint, per-value code: salt runs and future
    #             cross-index merges concatenate byte-wise without decoding
    # "bitpack" — frame-of-reference bit packing (functions/codec.py),
    #             12% smaller docs gaps + 55% smaller tfs at sf0.01
    #             (BASELINE.md); write-once only (requires
    #             compact_segments=True; merge_indexes refuses bitpack
    #             sources — re-encode is the price of the block code).
    # Pre-compaction salt runs are ALWAYS varint regardless of this flag.
    docs_codec: str = "varint"
    # segment files use SMALL parquet row groups so the page-lazy reader's
    # fetch unit (one row group of binary payloads) stays bounded — the
    # serving-side analog of block size.  ~512 terms x ~200 B payload ≈
    # 100 KB per fetch.
    segment_row_group_size: int = 512


    # --- pipeline control ---------------------------------------------------
    compact_segments: bool = True
    # how encoded salt-runs reach their per-shard merge task (compact path):
    # "sort"    — Ray groupby("shard") sort-based shuffle through the object
    #             store (no intermediate files)
    # "storage" — hive-partitioned staging write (partition_cols=["shard"])
    #             + one merge task per shard reading its dir: the same
    #             shuffle-via-storage pattern as the postings phase.  The
    #             sort barrier costs ~6 s wall for ~2 s of task time at 32
    #             CPUs on the 1M-doc bench (a flat cost that caps 8->32
    #             scaling efficiency); staging rides the page cache and
    #             overlaps the exchange with encode compute.
    segment_exchange: str = "storage"
    # M1 field extraction mode: "code" (path/leading-comment/content) or
    # "html" (reference DocumentProcessor selectors, stages/htmlproc.py)
    content_mode: str = "code"

    # --- bm25 ---------------------------------------------------------------
    bm25_k1: float = 1.2
    bm25_b: float = 0.75


@dataclass
class PageRankConfig:
    # nadry/ranker/PageRank.java:11-13
    damping: float = 0.85
    tolerance: float = 1.0e-6
    max_iter: int = 100
    # True replicates the reference's in/out-degree quirk (SURVEY.md §2.5 A10)
    as_implemented: bool = True

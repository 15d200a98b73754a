"""Fused-partition sizing (ADVICE r3): the count must derive from input
footprint, and — critically — operator OUTPUT must be independent of the
chosen partition count (partitioning affects task granularity only)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from nadry_search_engine_be_ray.stages import dedup
from nadry_search_engine_be_ray.stages import partitioning


def test_fused_parts_sizing():
    # no hint / empty -> historical default
    assert partitioning.fused_parts() == 64
    assert partitioning.fused_parts(bytes_hint=0) == 64
    # test-scale inputs resolve to the default too
    assert partitioning.fused_parts(bytes_hint=10 << 20) == 64
    # grows ~linearly with footprint past the target size
    big = partitioning.fused_parts(bytes_hint=100 << 30)  # 100 GB
    assert big > 64 * 10
    # clamped at the ceiling
    assert partitioning.fused_parts(bytes_hint=1 << 60) == partitioning.MAX_PARTS


def test_fused_parts_reads_input_files(ray_session):
    ds = ray.data.read_parquet("/root/testdata/sf0.01/documents.parquet")
    # small file -> default; must not trigger execution (input_files is
    # plan metadata)
    assert partitioning.fused_parts(ds) == 64
    # derived datasets lose the file list -> default, no crash
    assert partitioning.fused_parts(
        ds.map_batches(lambda b: b, batch_format="pyarrow")
    ) == 64


@pytest.mark.parametrize("forced_parts", [1, 7])
def test_output_independent_of_partition_count(
    ray_session, monkeypatch, forced_parts
):
    """dup_spans (gram partitioning) and ngram_jaccard (gram + pair
    partitioning) must return identical rows whether the exchange is fused
    into 1, 7, or 64 partitions."""
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "x alpha beta gamma delta epsilon zeta eta theta iota kappa y",
        "one two three four five six seven eight nine ten eleven",
        "one two three four five six seven eight different tail here",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)

    base_spans = (
        dedup.dup_spans(ds, n=8).to_pandas()
        .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    )
    base_pairs = (
        dedup.ngram_jaccard_pairs(ds, n=3, threshold=0.3).to_pandas()
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(base_spans) > 0 and len(base_pairs) > 0

    monkeypatch.setattr(
        dedup, "fused_parts", lambda *a, **k: forced_parts
    )
    spans = (
        dedup.dup_spans(ds, n=8).to_pandas()
        .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    )
    pairs = (
        dedup.ngram_jaccard_pairs(ds, n=3, threshold=0.3).to_pandas()
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert spans.equals(base_spans)
    assert pairs.equals(base_pairs)

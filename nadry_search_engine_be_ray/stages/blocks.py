"""Pinned-block hygiene for drop-to-raw-Ray kernels.

Every iterative graph kernel in this repo pins a Dataset's Arrow blocks in
the object store once (``ds.to_arrow_refs()``) and fans per-iteration
``@ray.remote`` tasks over them.  Ray Data's groupby/aggregate stages can
emit a zero-row block whose schema is **empty** (no columns at all) — a
shape that only appears above a certain input size, so it passes sf0.01
tests and then kills the kernel at sf0.1 with
``KeyError: 'Field "src" does not exist in schema'`` (the BENCH_r04 crash,
``pipelines/pagerank.py``).  Note ``select_columns`` upstream does NOT
protect against it: the empty-schema block flows through unchanged.

:func:`nonempty_refs` is the shared guard: it pins the blocks, probes each
one cluster-side (only a tiny metadata tuple travels to the driver — the
blocks themselves never do), drops zero-row blocks, and *raises* if a
non-empty block is genuinely missing a required column (that is a caller
bug, not the Ray quirk, and must not be silently dropped).

Kernels should ALSO keep an in-task guard (:func:`block_ok`) so they stay
safe when handed raw refs from other call sites.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa


def block_ok(tbl: pa.Table, *cols: str) -> bool:
    """True iff ``tbl`` has rows and every column in ``cols``.

    The in-task twin of :func:`nonempty_refs` — call first thing inside a
    pinned-block ``@ray.remote`` fn and return an empty partial on False.
    """
    return tbl.num_rows > 0 and all(c in tbl.column_names for c in cols)


def nonempty_refs(ds, required_cols: Sequence[str]):
    """Pin ``ds``'s Arrow blocks; return only refs to usable blocks.

    - zero-row blocks (including the empty-schema blocks Ray Data groupby
      emits at scale) are dropped — they carry no data for any kernel;
    - a block with rows but MISSING one of ``required_cols`` raises
      ``ValueError`` (real schema bug; silent dropping would corrupt
      results).

    The probe runs where each block lives (``num_cpus=0`` so probes never
    queue behind real work); only (num_rows, missing-column list) tuples
    come back to the driver, so this is safe at any block count.
    """
    import ray

    refs = ds.to_arrow_refs()
    if not refs:
        return []
    cols = list(required_cols)

    @ray.remote(num_cpus=0)
    def _probe(tbl: pa.Table):
        return tbl.num_rows, [c for c in cols if c not in tbl.column_names]

    stats = ray.get([_probe.remote(r) for r in refs])
    keep = []
    for ref, (n_rows, missing) in zip(refs, stats):
        if n_rows == 0:
            continue
        if missing:
            raise ValueError(
                f"nonempty_refs: non-empty block ({n_rows} rows) is missing "
                f"required column(s) {missing} (required: {cols!r})"
            )
        keep.append(ref)
    return keep

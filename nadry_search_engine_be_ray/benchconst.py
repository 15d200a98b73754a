"""Calm-host calibration constants shared by bench.py's probe/scaling/main.

Single source of truth so the probe verdict and the headline bench's
``vs_calm_best`` field cannot drift from each other (they previously
duplicated an inline literal).  Refresh these whenever BASELINE.md records
a new calm-host best; each constant cites the BASELINE.md table it mirrors.
"""

# Best recorded calm-host index-build throughput, 8 CPUs, 1M synthetic docs
# (BASELINE.md, round-3 scaling tables — the probe's reference point).
CALM_BEST_DOCS_PER_SEC_8CPU_1M = 20407.0

# Best recorded calm-host index-build throughput for the DEFAULT bench shape
# (32 CPUs, sf0.1 -> 20k docs, index on disk).  BASELINE.md round-4
# session-4 calm windows: 23:4x 4.376 s -> 4 571 docs/s (10.737 s e2e,
# 0.849x baseline), then 01:3x 3.771 s -> 5 304 docs/s (9.357 s e2e,
# 0.74x baseline); supersedes round-1's 2 956.
CALM_BEST_DOCS_PER_SEC_32CPU_SF01 = 5304.0

# Pure-compute spin throughput ratio (32-wide vs 8-wide per-core) measured on
# a calm window of this sandbox — the hypervisor's core-sharing ceiling any
# 8-vs-32 efficiency can reach (BASELINE.md round-2 control experiment).
SPIN_CEILING_CALM = 0.78

"""Calm-host calibration constants shared by bench.py's probe/scaling/main.

Single source of truth so the probe verdict and the headline bench's
``vs_calm_best`` field cannot drift from each other (they previously
duplicated an inline literal).  Refresh these whenever BASELINE.md records
a new calm-host best; each constant cites the BASELINE.md table it mirrors.
"""

# Best recorded calm-host index-build throughput, 8 CPUs, 1M synthetic docs
# (BASELINE.md, round-4 session-10 calm battery: 38.104 s -> 26,243.7
# docs/s at spin 0.862; supersedes round-3's 20,407).
CALM_BEST_DOCS_PER_SEC_8CPU_1M = 26243.7

# Best recorded calm-host index-build throughput for the DEFAULT bench shape
# (32 CPUs, sf0.1 -> 20k docs, index on disk).  BASELINE.md round-4
# session-10 calm battery: 3.062 s -> 6 531.8 docs/s (7.898 s e2e,
# 0.625x baseline); supersedes session-4's 5 304 and round-1's 2 956.
CALM_BEST_DOCS_PER_SEC_32CPU_SF01 = 6947.3  # round-5 record (spin 0.803)

# Pure-compute spin throughput ratio (32-wide vs 8-wide per-core) measured on
# a calm window of this sandbox — the hypervisor's core-sharing ceiling any
# 8-vs-32 efficiency can reach (BASELINE.md round-2 control experiment).
SPIN_CEILING_CALM = 0.78

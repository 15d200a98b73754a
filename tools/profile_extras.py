"""Per-stage profiling of the slowest bench extras (VERDICT r3 #6):
lm_dsir / pq_ann / window_suite, each phase timed separately, with
``ds.stats()`` for the Dataset-shaped phases.  Run on a CALM host (check
``python bench.py --probe`` first); prints one JSON line plus the stats
blocks to stderr.

Usage: PYTHONPATH=/root/repo python tools/profile_extras.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import ray.data

    t: dict[str, float] = {}

    def clock(name):
        class _C:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *a):
                t[name] = round(time.time() - self.t0, 3)

        return _C()

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )

    # --- lm_dsir ----------------------------------------------------------
    from nadry_search_engine_be_ray.stages.dsir import dsir_select
    from nadry_search_engine_be_ray.stages.lm import lm_score, train_lm

    with clock("lm_train"):
        model = train_lm(docs, min_count=2)
    with clock("lm_score"):
        scored = lm_score(docs, model)
        scored_m = scored.materialize()
    print("=== lm_score stats ===\n" + scored_m.stats(), file=sys.stderr)
    lang_ds = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    with clock("dsir_select"):
        dsir_select(lang_ds, lang_ds.filter(expr="lang == 'en'"), k=100)

    # --- pq_ann -----------------------------------------------------------
    from nadry_search_engine_be_ray.stages.pq import (
        pq_adc_topk, pq_encode, pq_train,
    )

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    head = emb.to_pandas().sort_values("vec_id").head(8)
    qv = np.stack(head["embedding"].to_numpy()).astype(np.float64)
    with clock("pq_train"):
        cb, normed = pq_train(emb, m=8, k=16, n_iters=8)
    with clock("pq_encode"):
        enc = pq_encode(normed, cb).materialize()
    print("=== pq_encode stats ===\n" + enc.stats(), file=sys.stderr)
    with clock("pq_adc_topk"):
        pq_adc_topk(enc, qv, cb, qv_ids=head["vec_id"].to_numpy(), k=10)

    # --- window_suite -----------------------------------------------------
    from nadry_search_engine_be_ray.pipelines import relational as rel

    for name, fn in [
        ("w_cumsum", rel.q_cumulative_sum),
        ("w_sessionize", rel.q_sessionize),
        ("w_asof", rel.q_asof_join),
        ("w_deltas", rel.q_event_deltas),
        ("w_funnel", rel.q_funnel_conversion),
    ]:
        with clock(name):
            fn(sf)

    print(json.dumps({"metric": "profile_extras", "sf_dir": sf,
                      "num_cpus": ncpu, "timings": t}))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Benchmark harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "docs_per_sec": ..., "query_p50_ms": ...}

``--scaling`` runs the same job in two fresh processes (8 vs 32 CPUs) and
reports both throughputs + scaling efficiency (the sandbox substitute for
the N vs 4N node cluster criterion — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf() -> float:
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    return float(m.group(1)) if m else 0.1


def bench_corpus_docs(sf: float) -> int:
    env = os.environ.get("GRAFT_BENCH_DOCS")
    if env:
        return int(env)
    return max(500, int(sf * 200_000))  # sf0.1 -> 20k docs


def main() -> None:
    # Contention self-documentation (VERDICT r3 #1): the pure-compute spin
    # ceiling is measured BEFORE ray.init (mp.Pool forks cleanly) and lands
    # in the headline JSON, so every snapshot records whether the window was
    # calm (~>=0.78 on this sandbox) or degraded — a 2.6x-slow reading on a
    # contended host is then distinguishable from a code regression.
    host_spin_ceiling = None
    if "--build-only" not in sys.argv:
        host_spin_ceiling = _spin_ceiling_pair(8, 32)

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import ray.data

    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines import relational as rel
    from nadry_search_engine_be_ray.pipelines.build import build_index
    from nadry_search_engine_be_ray.pipelines.query import SearchEngine
    from nadry_search_engine_be_ray.pipelines.serve import batch_search
    from nadry_search_engine_be_ray.sources.corpus import reference_queries, write_corpus
    from nadry_search_engine_be_ray.stages.dedup import minhash_lsh_pairs
    from nadry_search_engine_be_ray.stages.similarity import brute_force_topk

    sf = _sf()
    n_docs = bench_corpus_docs(sf)

    # --- corpus generation (untimed, cached) + page-cache warm read --------
    corpus_dir = f"/tmp/nadry_bench/corpus_{n_docs}"
    write_corpus(corpus_dir, n_docs=n_docs, seed=42)
    ray.data.read_parquet(corpus_dir).count()  # warm the OS page cache

    # Best-of-N headline (VERDICT r3 #1): the comparable headline keys run
    # N>=2 times and the JSON reports the per-key MIN (min filters transient
    # interference; both raw totals are also emitted).  --build-only stays
    # single-run — scaling() does its own min-of-2 at the run level.
    n_runs = 1 if "--build-only" in sys.argv else int(
        os.environ.get("GRAFT_BENCH_RUNS", "2")
    )
    run_timings: list[dict[str, float]] = []
    run_p50: list[float] = []
    for _attempt in range(n_runs):
        timings = {}

        # --- index build ---------------------------------------------------
        # GRAFT_TMP lets the scaling harness put index artifacts on tmpfs: the
        # single-box CPU-scaling substitute shares ONE disk between "clusters",
        # while a real N -> 4N cluster scales disk with nodes — tmpfs isolates
        # the compute+shuffle scaling the criterion actually targets.
        index_dir = tempfile.mkdtemp(
            prefix="nadry_bench_index_", dir=os.environ.get("GRAFT_TMP")
        )
        t0 = time.time()
        # partition count scales with data (standard practice): enough reduce
        # tasks to use every core at 1M docs without drowning a 20k-doc corpus
        # in per-partition fixed costs
        n_shards = 32 if n_docs > 100_000 else 8
        build_index(
            corpus_dir, index_dir,
            BuildConfig(
                num_shards=n_shards, salt_bits=2,
                # the coalesce before the hash-partitioned write bounds file
                # count but ALSO caps write parallelism — size it to the cores
                postings_write_blocks=max(16, NUM_CPUS),
            ),
        )
        timings["index_build"] = time.time() - t0
        docs_per_sec = n_docs / timings["index_build"]

        if "--build-only" in sys.argv:
            shutil.rmtree(index_dir, ignore_errors=True)
            ray.shutdown()
            print(
                json.dumps(
                    {
                        "metric": "index_build_sec",
                        "value": round(timings["index_build"], 3),
                        "unit": "sec",
                        "queries": {k: round(v, 3) for k, v in timings.items()},
                        "sf": sf,
                        "num_cpus": NUM_CPUS,
                        "n_docs": n_docs,
                        "docs_per_sec": round(docs_per_sec, 1),
                    }
                )
            )
            return

        # --- query latency (reference scorer + BM25 block-max WAND) ------------
        engine = SearchEngine(index_dir)
        queries = [q["query"] for q in reference_queries()]
        lat_ref, lat_bm25 = [], []
        for rep in range(3):
            for q in queries:
                t0 = time.time()
                engine.search_auto(q + ("" if rep == 0 else f" {rep}"), 0, 10)
                lat_ref.append(time.time() - t0)
        plain = [q for q in queries if not q.startswith('"')]
        for rep in range(3):
            for q in plain:
                t0 = time.time()
                engine.bm25_search(q, k=10, use_wand=False)
                lat_bm25.append(time.time() - t0)
        timings["query_reference_total"] = sum(lat_ref)
        timings["query_bm25_total"] = sum(lat_bm25)
        p50_ms = statistics.median(lat_bm25) * 1000

        # --- batch query throughput via the actor pool --------------------------
        many = (plain * 20)[:200]
        qds = ray.data.from_arrow(pa.table({"query": pa.array(many, pa.string())}))
        t0 = time.time()
        batch_search(qds, index_dir, mode="bm25",
                     concurrency=min(4, max(1, NUM_CPUS // 4))).count()
        timings["batch_queries_200"] = time.time() - t0

        # --- training-data extras over the sf tables ----------------------------
        t0 = time.time()
        docs_ds = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas()  # lazy -> consume
        timings["dedup_minhash"] = time.time() - t0

        t0 = time.time()
        emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
        head = emb.to_pandas().sort_values("vec_id").head(8)
        qv = np.stack(head["embedding"].to_numpy()).astype(np.float64)
        brute_force_topk(ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet"), qv, k=10)
        timings["ann_topk"] = time.time() - t0

        t0 = time.time()
        rel.q_agg_pushdown(SF_DIR)
        rel.q_window(SF_DIR)
        timings["relational_agg_window"] = time.time() - t0

        if _attempt < n_runs - 1:
            shutil.rmtree(index_dir, ignore_errors=True)
        run_timings.append(timings)
        run_p50.append(p50_ms)
    # the last run's index stays alive for the search-feature extras below

    # per-key min across the N runs is the comparable headline; both raw
    # totals are reported so a noisy run is visible, not hidden
    headline_totals = [round(sum(rt.values()), 3) for rt in run_timings]
    timings = {k: min(rt[k] for rt in run_timings) for k in run_timings[0]}
    p50_ms = min(run_p50)
    docs_per_sec = n_docs / timings["index_build"]

    # --- search features over the last run's live index (non-headline) -----
    extra_timings: dict[str, float] = {}
    from nadry_search_engine_be_ray.pipelines.query import (
        boolean_search, facet_counts, prefix_suggest, proximity_pairs,
        spell_correct, wildcard_terms,
    )

    t0 = time.time()
    facet_counts(index_dir, ["search", "engin", "index"], mode="any")
    spell_correct(index_dir, ["serch", "documnt", "indx", "tokken"])
    prefix_suggest(index_dir, ["se", "ind", "tok"], k=5)
    wildcard_terms(index_dir, ["se%ch", "tok%", "%tion"])
    boolean_search(index_dir, {
        "b1": ("and", "search", "engin"),
        "b2": ("and", "search", ("not", "engin")),
    })
    proximity_pairs(index_dir, ["search", "engin", "index"], window=3)
    # round-5 additions: gram-pruned suggesters + champion/highlight paths
    from nadry_search_engine_be_ray.pipelines.query import (
        prefix_suggest_kgram, spell_correct_kgram,
    )
    from nadry_search_engine_be_ray.pipelines.serve import (
        ChampionEvalActor, HighlightEvalActor, ensure_champion_tier,
    )

    spell_correct_kgram(index_dir, ["serch", "documnt", "indx", "tokken"])
    prefix_suggest_kgram(index_dir, ["se", "ind", "tok"], k=5)
    ensure_champion_tier(index_dir, m=3)
    _hl_q = pa.table({"query": pa.array(
        ["search engine", "index merge", "national community"], pa.string())})
    ray.data.from_arrow(_hl_q).map_batches(
        ChampionEvalActor, fn_constructor_args=(index_dir, 3, 10),
        batch_format="pyarrow", batch_size=16, concurrency=2).to_pandas()
    ray.data.from_arrow(_hl_q).map_batches(
        HighlightEvalActor, fn_constructor_args=(index_dir, 3),
        batch_format="pyarrow", batch_size=16, concurrency=2).to_pandas()
    extra_timings["search_features"] = time.time() - t0

    # --- ranked-retrieval variants over the live index (non-headline) ------
    import pyarrow as _pa

    from nadry_search_engine_be_ray.pipelines.serve import (
        CollapseEvalActor, ExplainEvalActor, RocchioEvalActor,
        SearchAfterEvalActor, SynonymEvalActor, batch_search,
    )

    t0 = time.time()
    qtbl = _pa.table({"query": _pa.array(
        ["search engine", "item order arrived", "national community",
         "index merge", "running university"] * 8, _pa.string())})
    for actor in (SearchAfterEvalActor, CollapseEvalActor, RocchioEvalActor,
                  SynonymEvalActor, ExplainEvalActor):
        ray.data.from_arrow(qtbl).map_batches(
            actor, fn_constructor_args=(index_dir,),
            batch_format="pyarrow", batch_size=16, concurrency=2,
        ).to_pandas()
    batch_search(ray.data.from_arrow(qtbl), index_dir,
                 mode="bm25f", concurrency=2).to_pandas()
    extra_timings["ranked_variants"] = time.time() - t0
    shutil.rmtree(index_dir, ignore_errors=True)

    # --- codec tiers (non-headline, VERDICT r4 #6): build + full decode
    # scan + query p50 for each posting codec at the bench corpus scale, so
    # the "bitpack for cold, varint for hot" claim in BASELINE.md carries
    # measured query-path numbers, not just size accounting -----------------
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    codec_tiers: dict[str, dict] = {}
    t_tiers = time.time()
    for tier in ("varint", "bitpack", "ef"):
        tdir = tempfile.mkdtemp(
            prefix=f"nadry_bench_codec_{tier}_",
            dir=os.environ.get("GRAFT_TMP"),
        )
        t0 = time.time()
        build_index(
            corpus_dir, tdir,
            BuildConfig(num_shards=n_shards, salt_bits=2,
                        postings_write_blocks=max(16, NUM_CPUS),
                        docs_codec=tier),
        )
        build_sec = time.time() - t0
        rd = SegmentReader(tdir)
        t0 = time.time()
        n_postings = 0
        for tm in rd.terms():      # decode EVERY posting list once
            n_postings += int(rd.postings(tm).docs.size)
        scan_sec = time.time() - t0
        eng = SearchEngine(tdir)
        lat = []
        for rep in range(3):       # rep suffix dodges the query cache
            for q in plain:
                t0q = time.time()
                eng.bm25_search(q + ("" if rep == 0 else f" {rep}"),
                                k=10, use_wand=True)
                lat.append(time.time() - t0q)
        codec_tiers[tier] = {
            "build_sec": round(build_sec, 3),
            "full_scan_sec": round(scan_sec, 3),
            "n_postings": n_postings,
            "query_p50_ms": round(statistics.median(lat) * 1000, 3),
        }
        shutil.rmtree(tdir, ignore_errors=True)
    extra_timings["codec_tiers_total"] = time.time() - t_tiers

    # --- per-user window/session ops (partition-fused; non-headline) -------
    t0 = time.time()
    rel.q_cumulative_sum(SF_DIR)
    rel.q_sessionize(SF_DIR)
    rel.q_asof_join(SF_DIR)
    rel.q_event_deltas(SF_DIR)
    rel.q_funnel_conversion(SF_DIR)
    extra_timings["window_suite"] = time.time() - t0

    # --- curation ops (reported, NOT in the headline total: the baseline
    # series predates these keys; comparable keys stay comparable) ----------
    from nadry_search_engine_be_ray.stages.curation import (
        c4_clean, decontaminate, pack_sequences, paragraph_dedup,
        repetition_scores,
    )

    t0 = time.time()
    docs_tbl = docs_ds.to_pandas().sort_values("doc_id")
    bench_texts = docs_tbl["text"].head(10).tolist()
    decontaminate(docs_ds, bench_texts, n=8).count()
    pack_sequences(docs_ds, context=1024).count()
    repetition_scores(docs_ds).count()
    c4_clean(docs_ds).count()
    paragraph_dedup(docs_ds).count()
    extra_timings["curation_suite"] = time.time() - t0

    # --- sampling + clustering + substring dedup (also non-headline) --------
    from nadry_search_engine_be_ray.stages.clustering import semdedup_pairs
    from nadry_search_engine_be_ray.stages.dedup import dup_spans
    from nadry_search_engine_be_ray.stages.sampling import (
        assign_splits, shuffle_shards,
    )

    t0 = time.time()
    assign_splits(
        ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    ).count()
    shuffle_shards(
        ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"]),
        n_shards=32,
    ).count()
    extra_timings["sampling_suite"] = time.time() - t0

    t0 = time.time()
    semdedup_pairs(
        ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet"),
        k=16, threshold=0.95, n_iters=5,
    ).count()
    extra_timings["semdedup"] = time.time() - t0

    # --- logistic-regression quality classifier (train + score) ------------
    from nadry_search_engine_be_ray.stages.classifier import lr_fit, lr_predict

    t0 = time.time()
    emb_lbl = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )

    def _add_y(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "y", pc.cast(pc.less(batch["label"], 5), pa.int64())
        )

    labeled = emb_lbl.map_batches(_add_y, batch_format="pyarrow")
    w_lr = lr_fit(labeled, label_col="y", n_iters=30, lr=1.0)
    lr_predict(emb_lbl, w_lr).count()
    extra_timings["classifier"] = time.time() - t0

    t0 = time.time()
    dup_spans(docs_ds, n=8).count()
    extra_timings["dup_spans"] = time.time() - t0

    # --- n-gram LM perplexity + DSIR selection (also non-headline) ----------
    from nadry_search_engine_be_ray.stages.dsir import dsir_select
    from nadry_search_engine_be_ray.stages.lm import lm_score, train_lm

    t0 = time.time()
    model = train_lm(docs_ds, min_count=2)
    lm_score(docs_ds, model).count()
    lang_ds = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    dsir_select(lang_ds, lang_ds.filter(expr="lang == 'en'"), k=100)
    extra_timings["lm_dsir"] = time.time() - t0

    from nadry_search_engine_be_ray.stages.pq import (
        pq_adc_topk, pq_encode, pq_train,
    )

    t0 = time.time()
    emb_ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cb, normed = pq_train(emb_ds, m=8, k=16, n_iters=8)
    pq_adc_topk(pq_encode(normed, cb), qv, cb,
                qv_ids=head["vec_id"].to_numpy(), k=10)
    extra_timings["pq_ann"] = time.time() - t0

    # --- session-7 analytics/IR additions (also non-headline) --------------
    from nadry_search_engine_be_ray.pipelines.textqueries import (
        lm_dirichlet, ltr_linear, phrase_suggest, pmi_pairs,
    )

    t0 = time.time()
    lm_dirichlet(SF_DIR)
    ltr_linear(SF_DIR)
    pmi_pairs(SF_DIR)
    phrase_suggest(SF_DIR)
    extra_timings["ranking_extras"] = time.time() - t0

    t0 = time.time()
    rel.q_tpch_q6(SF_DIR)
    rel.q_tpch_q10(SF_DIR)
    rel.q_skyline_orders(SF_DIR)
    rel.q_retention_cohorts(SF_DIR)
    rel.q_interval_coverage(SF_DIR)
    extra_timings["analytics_extras"] = time.time() - t0

    # --- session-8 additions (also non-headline): the TPC-H tail, the NB
    # classifier's count shuffle, and the two-pass exact-rank NTILE -------
    t0 = time.time()
    rel.q_tpch_q8(SF_DIR)
    rel.q_tpch_q9(SF_DIR)
    rel.q_tpch_q21(SF_DIR)
    rel.q_ntile_quartiles(SF_DIR)
    rel.q_scd2_dimension(SF_DIR)
    extra_timings["tpch_tail_extras"] = time.time() - t0

    t0 = time.time()
    import ray.data as _rd

    from nadry_search_engine_be_ray.stages.classifier import (
        nb_classify, nb_fit,
    )

    _docs_ds = _rd.read_parquet(f"{SF_DIR}/documents.parquet",
                                columns=["doc_id", "text", "lang"])
    _model = nb_fit(_docs_ds, text_col="text", label_col="lang")
    nb_classify(_docs_ds, _model).materialize()
    extra_timings["naive_bayes"] = time.time() - t0

    # --- session-9 additions (also non-headline): the ordered-scan
    # primitives over the full event stream, then the ER/robust-stats
    # family ---------------------------------------------------------------
    from nadry_search_engine_be_ray.pipelines import scan_ops as _scan

    t0 = time.time()
    _scan.q_rolling_halo(SF_DIR)
    _scan.q_stream_dedup(SF_DIR)
    _scan.q_dense_ids(SF_DIR)
    rel.q_clamped_balance(SF_DIR)
    rel.q_ts_dod_bits(SF_DIR)
    extra_timings["scan_ops_extras"] = time.time() - t0

    t0 = time.time()
    rel.q_hierarchy_rollup(SF_DIR)
    rel.q_er_blocking(SF_DIR)
    rel.q_theil_sen(SF_DIR)
    rel.q_kaplan_meier(SF_DIR)
    rel.q_cross_correlation(SF_DIR)
    extra_timings["session9_extras"] = time.time() - t0

    # --- session-10 additions (non-headline): the quant-analytics and
    # text/graph families --------------------------------------------------
    from nadry_search_engine_be_ray.pipelines import quant_ops as _qo
    from nadry_search_engine_be_ray.pipelines import textqueries as _tq10

    t0 = time.time()
    _qo.q_mad_outliers(SF_DIR)
    _qo.q_isotonic_calibration(SF_DIR)
    _qo.q_item_cf_topk(SF_DIR)
    _qo.q_attribution_linear(SF_DIR)
    _qo.q_rle_profile(SF_DIR)
    extra_timings["quant_extras"] = time.time() - t0

    t0 = time.time()
    _tq10.textrank_keywords(SF_DIR)
    _scan.q_rolling_band(SF_DIR)
    extra_timings["session10_text_extras"] = time.time() - t0

    ray.shutdown()

    from nadry_search_engine_be_ray.benchconst import (
        CALM_BEST_DOCS_PER_SEC_32CPU_SF01,
        SPIN_CEILING_CALM,
    )

    total = sum(timings.values())
    timings = {**timings, **extra_timings}
    print(
        json.dumps(
            {
                "metric": "e2e_index_build_query_and_extras_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": sf,
                "num_cpus": NUM_CPUS,
                "n_docs": n_docs,
                "docs_per_sec": round(docs_per_sec, 1),
                "query_p50_ms": round(p50_ms, 3),
                # contention evidence (VERDICT r3 #1): value/queries above are
                # per-key MINs over headline_runs; host_spin_ceiling < ~0.78
                # or vs_calm_best << 1 marks a degraded measurement window
                "headline_runs": n_runs,
                "headline_totals_raw": headline_totals,
                # per-codec build / full-decode / query-p50 (non-headline)
                "codec_tiers": codec_tiers,
                "host_spin_ceiling": round(host_spin_ceiling, 3),
                "host_spin_ceiling_calm_ref": SPIN_CEILING_CALM,
                # only comparable at the default bench shape the constant
                # was recorded at (sf0.1, 32 CPUs, 20k docs)
                "vs_calm_best": (
                    round(docs_per_sec / CALM_BEST_DOCS_PER_SEC_32CPU_SF01, 3)
                    if sf == 0.1 and NUM_CPUS == 32 and n_docs == 20000
                    else None
                ),
            }
        )
    )


def _spin_burn(_) -> int:
    """Module-level (mp.Pool-picklable) pure-compute spin for the host
    calibration: 3 s of register arithmetic, returns the iteration count."""
    end = time.time() + 3
    x = 0
    while time.time() < end:
        for _ in range(10_000):
            x += 1
    return x


def _spin_ceiling_pair(lo: int, hi: int) -> float:
    """Host calibration shared by main()/scaling()/probe(): per-core
    pure-compute throughput at lo-wide vs hi-wide concurrency (a 3 s spin
    per width, no memory traffic, no Ray).  On bare metal this is ~1.0; on
    a virtualized box the hypervisor's core sharing shows up here directly
    — measured ~0.78 calm on this sandbox (see benchconst.py), which is
    the CEILING any lo-vs-hi pipeline efficiency can reach.  Readings well
    below the calm reference mark a contended measurement window."""
    import multiprocessing as mp

    rates = {}
    for width in (lo, hi):
        with mp.Pool(width) as pool:
            iters = pool.map(_spin_burn, range(width))
        rates[width] = sum(iters) / width
    return rates[hi] / rates[lo]


def scaling() -> None:
    """Same job at 8 vs 32 CPUs in fresh processes; report efficiency.

    Uses a corpus large enough (default 100k docs, override
    ``GRAFT_SCALING_DOCS``) that per-phase job-launch fixed costs amortize —
    the cluster-scaling criterion measures how the WORK scales, and at 100 TB
    the work dominates; a tiny corpus would measure Ray's constant overheads
    instead.
    """
    n_docs = os.environ.get("GRAFT_SCALING_DOCS", "1000000")

    def _settle():
        # flush the previous run's ~1 GB of dirty pages and equalize cache
        # state, else the SECOND child measures the FIRST child's writeback
        os.sync()
        try:
            with open("/proc/sys/vm/drop_caches", "w") as f:
                f.write("1")
        except OSError:
            pass
        time.sleep(3)

    def _run(ncpu: int) -> dict:
        _settle()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_DOCS=n_docs)
        env.setdefault("GRAFT_TMP", "/dev/shm")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--build-only"],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # min of 2 runs per level (standard practice: min filters interference);
    # the CPU pair is overridable (GRAFT_SCALING_CPUS="4,16") for
    # environment-control experiments at other N:4N points
    lo, hi = (
        int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")
    )
    ceiling = _spin_ceiling_pair(lo, hi)
    # INTERLEAVED tier order (lo, hi, lo, hi): contention on this sandbox
    # arrives in multi-minute waves, and a grouped order (lo, lo, hi, hi)
    # lets one wave wipe BOTH wide-tier runs (observed twice on
    # 2026-08-18: the 16-CPU pair alone degraded 1.5-1.9x mid-run).
    # Interleaving decorrelates which tier a wave hits; min per level
    # then picks each tier's clean run.
    n_per_level = int(os.environ.get("GRAFT_SCALING_RUNS", "2"))
    runs: dict[int, list] = {lo: [], hi: []}
    for ncpu in (lo, hi) * n_per_level:
        runs[ncpu].append(_run(ncpu))
    results = {
        ncpu: min(rs, key=lambda r: r["queries"]["index_build"])
        for ncpu, rs in runs.items()
    }
    ceiling_end = _spin_ceiling_pair(lo, hi)
    b8 = results[lo]["queries"]["index_build"]
    b32 = results[hi]["queries"]["index_build"]
    eff = (b8 / b32) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_index_build",
                "n_docs": int(n_docs),
                "cpus": [lo, hi],
                f"sec_{lo}cpu": b8,
                f"sec_{hi}cpu": b32,
                f"docs_per_sec_{lo}cpu": results[lo]["docs_per_sec"],
                f"docs_per_sec_{hi}cpu": results[hi]["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "host_spin_ceiling": round(ceiling, 3),
                # re-probed AFTER the runs: a big start/end delta marks a
                # contention wave arriving mid-measurement
                "host_spin_ceiling_end": round(ceiling_end, 3),
                "efficiency_vs_ceiling": round(eff / ceiling, 3),
                "all_runs_sec": {
                    str(ncpu): [
                        round(r["queries"]["index_build"], 2) for r in rs
                    ]
                    for ncpu, rs in runs.items()
                },
            }
        )
    )


def probe() -> None:
    """Cheap calm-host pre-check before burning a full ``--scaling`` run:
    the pure-compute spin ceiling (8-vs-32-wide) plus ONE 8-CPU 1M-doc
    build.  The spin ceiling alone is insufficient — contention windows
    were observed where it read 0.82 yet the 8-CPU build ran 2.2× slow
    (memory-bandwidth steal the register-spin probe can't see) — so the
    verdict requires BOTH: ceiling ≥ 0.78 AND build throughput within 75 %
    of the recorded calm best (benchconst.py, mirroring BASELINE.md)."""
    from nadry_search_engine_be_ray.benchconst import (
        CALM_BEST_DOCS_PER_SEC_8CPU_1M,
        SPIN_CEILING_CALM,
    )

    ceiling = _spin_ceiling_pair(8, 32)

    n_docs = os.environ.get("GRAFT_SCALING_DOCS", "1000000")
    env = dict(os.environ, RAY_GRAFT_CPUS="8", GRAFT_BENCH_DOCS=n_docs)
    env.setdefault("GRAFT_TMP", "/dev/shm")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--build-only"],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    build = json.loads(out.strip().splitlines()[-1])
    dps = build["docs_per_sec"]
    calm_best = CALM_BEST_DOCS_PER_SEC_8CPU_1M
    print(
        json.dumps(
            {
                "metric": "host_probe",
                "host_spin_ceiling": round(ceiling, 3),
                "docs_per_sec_8cpu": dps,
                "vs_calm_best": round(dps / calm_best, 3),
                "calm": bool(
                    ceiling >= SPIN_CEILING_CALM and dps >= 0.75 * calm_best
                ),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--probe" in sys.argv:
        probe()
    else:
        main()

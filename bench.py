#!/usr/bin/env python
"""Benchmark harness — the driver's per-round feedback loop.

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a full materialization (``collect`` of the
result — results are small aggregates by design; we never collect a fact
table).  Timing includes plan + execution, excludes session startup.

Queries at or above 0.5 s are timed median-of-3 (raw reps published as
``query_reps`` for dispersion); sub-0.5 s queries keep a single rep to
stay inside the per-round bench budget.  ``queries`` carries the median,
so round-over-round comparison stays a plain per-query diff.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline set: the data-heavy queries over the driver's star schema +
# events + documents + embeddings.  Engine-parity microqueries (grid DSL,
# run lifecycle) are correctness-gated but not perf-representative, so
# they are excluded here.
HEADLINE = [
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_priority_late_ship",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_late_shipments",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q19_discounted_revenue",
    "q20_promotion_suppliers",
    "q21_waiting_supplier",
    "q22_sales_opportunity",
    "q_top_customers_per_nation",
    "q_order_priority_count",
    "q_part_brand_stats",
    "q_exists_semijoin",
    "q_antijoin_no_orders",
    "q_rollup_region_revenue",
    "q_cube_flag_status",
    "q_percentile_quantity",
    "q_hll_sketch_union_regions",
    "q_quantile_hist_rollup",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_orders",
    "events_asof_join",
    "events_cogroup_asof",
    "events_rolling_window",
    "events_tumbling_5min",
    "events_sliding_10m5m",
    "events_sessionization",
    "events_hourly_by_type",
    "events_user_props_json",
    "events_props_variant",
    "events_resample_1min",
    "events_value_outliers",
    "events_value_histogram",
    "multimodal_binaryfile_ingest",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_quality_scores",
    "text_language_id",
    "text_token_counts",
    "text_fingerprint",
    "docs_tfidf_topk",
    "docs_bm25_search",
    "corpus_bigram_pmi",
    "docs_pack_sequences",
    "docs_lm_perplexity",
    "multimodal_phash_pairs",
    "sim_cosine_topk",
    "sim_lsh_ann",
    "sim_lsh_recall",
    "sim_ivf_ann",
    "embed_nearest_centroid",
    "embedding_near_dup",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_audio_energy",
    "stream_tumbling_counts",
    "stream_view_purchase_join",
    "embed_quantize_int8",
    "embed_pq_codes",
    "events_funnel_stages",
    "q_salted_skew_join",
    "events_lead_lag_gaps",
    "events_markov_transitions",
    "events_first_last_by_user",
    "dedup_keep_best",
    "corpus_token_stats",
    "docs_quality_gate",
    "docs_quality_classifier",
    "docs_stratified_sample",
    "q_grouping_sets_mix",
    "q_supplier_balance_dist",
    "events_range_frame",
    "docs_repetition_stats",
    "docs_token_runs_udtf",
    "stream_dedup_events",
    "stream_static_enrich",
    "q_pandas_udf_weighted_avg",
    "dedup_clusters",
    # dedup_clusters_lsh retired r7: identical plan to dedup_clusters
    # since the r6 headline rename (VERDICT r6 weak #1) — one timed
    # entry per distinct plan; old artifacts map to dedup_clusters.
    "dedup_clusters_exact",
    "docs_substring_dup",
    "docs_substring_dup_w64",
    "dedup_incremental_batch",
    "stream_near_dedup_docs",
    "stream_feed_compaction",
    "docs_source_quota",
    "embed_semdedup",
    "semdedup_kmeans",
    "semdedup_kmeans_scaled",
    "docs_leakage_safe_split",
    "docs_mixture_epochs",
    "docs_pii_scrub",
    "pipeline_prepare_corpus",
    "docs_decontaminate",
    "docs_decontaminate_fuzzy",
    "events_user_retention",
    "events_growth_accounting",
    "embed_kmeans_lloyd",
    "pq_kmeans_codes",
    "dedup_bloom_gate",
    "dedup_cluster_size_hist",
    "docs_chunk_tokens",
    "docs_train_val_test_split",
    "pipeline_training_samples",
    "docs_dsir_weights",
    "docs_inbatch_negatives",
    "corpus_zipf_slope",
    "corpus_bpe_merges",
    "embed_batch_drift",
    "sim_ivfpq_ann",
    "sim_ivf_delete_serve",
    "corpus_heavy_hitters",
    "docs_weighted_sample",
    "docs_ols_scaling_fit",
    "docs_stratified_weighted_sample",
    "corpus_cms_freq",
    "docs_global_shuffle_shards",
    "stream_ols_trend",
    "stream_cms_freq",
    "corpus_overlap_kmv",
    "docs_lang_overlap_matrix",
    # r8: the sketch-only production path (no exact twin in the timed
    # region — VERDICT r7 item 5) and the multi-shard rollup identity
    "corpus_overlap_kmv_sketch",
    "corpus_kmv_rollup",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    import __spark_entry__ as entrymod
    from psweep_spark.session import get_spark

    # Per-query shuffle instrumentation (VERDICT r9 item 3) — always on.
    # Earlier rounds gated this behind SPARK_GRAFT_BENCH_METRICS because
    # the UI REST endpoint required spark.ui.enabled=true (~15% wall for
    # the UI event pipeline).  The AppStatusStore behind that endpoint
    # exists UI-or-not (SparkContext always runs AppStatusListener), so
    # reading it directly costs one py4j traversal per query and zero
    # timed-region overhead.  Stages are keyed by their monotonically
    # increasing stage id, so "bytes of stages created by THIS query"
    # is eviction-proof (summing a cumulative total would silently drop
    # stages once spark.ui.retainedStages evicts old ones mid-run).
    spark = get_spark("psweep-spark-bench")
    queries = entrymod.queries()

    _gw = spark.sparkContext._gateway  # noqa: SLF001
    _store = spark.sparkContext._jsc.sc().statusStore()  # noqa: SLF001

    def _stages():
        empty = _gw.jvm.java.util.ArrayList()
        seq = _store.stageList(
            empty, False, False, _gw.new_array(_gw.jvm.double, 0), empty
        )
        it = seq.iterator()
        while it.hasNext():
            yield it.next()

    def max_stage_id() -> int:
        try:
            return max((s.stageId() for s in _stages()), default=-1)
        except Exception:  # noqa: BLE001  (metrics are best-effort)
            return -1

    def shuffle_since(stage_floor: int) -> float | None:
        """MB shuffled by stages with id > stage_floor.  The listener
        bus is async — settle until no stage of this query is still
        ACTIVE (bounded wait; collect() already returned)."""
        try:
            for _ in range(20):
                pending = any(
                    s.stageId() > stage_floor
                    and str(s.status()) == "ACTIVE"
                    for s in _stages()
                )
                if not pending:
                    break
                time.sleep(0.05)
            total = sum(
                s.shuffleWriteBytes()
                for s in _stages()
                if s.stageId() > stage_floor
            )
            return round(total / 1048576, 3)
        except Exception:  # noqa: BLE001
            return None

    # Untimed warmup: pay one-time JVM/codegen/Arrow-worker init once so
    # per-query numbers measure steady-state throughput (the 100 TB
    # regime), not first-query session bring-up.  Each headline query is
    # warmed at the SMALLEST scale factor (sf0.001) — identical plans →
    # identical generated classes, so the codegen-compile + C2-JIT cost
    # (measured 10-16 s for the HOF-heavy dedup pipelines, vs 3 s
    # steady-state) lands here, not in the timings; at 100 TB these
    # compile costs amortize to zero.
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").agg(F.sum("l_quantity")).collect()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.limit(256).mapInPandas(lambda it: it, docs.schema).count()
    # Provision memoized landings/indexes for THIS sf_dir untimed (each
    # is keyed on corpus identity inside its query): these queries model
    # an already-landed bucket / already-built index, so their timed
    # runs measure steady-state serving, not one-time materialization —
    # on a fresh machine the first invocation would otherwise pay the
    # landing write (the r4/r5 bench-attribution lesson, applied to
    # every landing-based query rather than just the blob ingest).
    for _prov in (
        "multimodal_binaryfile_ingest",
        "stream_near_dedup_docs",
        "stream_feed_compaction",
        "sim_ivf_delete_serve",
        "stream_cms_freq",
    ):
        if _prov in queries:
            try:
                queries[_prov](spark, sf_dir).count()
            except Exception:  # noqa: BLE001
                pass
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.realpath(warm_dir) != os.path.realpath(sf_dir):
        for name in HEADLINE:
            fn = queries.get(name)
            if fn is None:
                continue
            try:
                fn(spark, warm_dir).collect()
            except Exception:  # noqa: BLE001
                pass
        # Drain warmup state BEFORE timing starts: the warmup leaves
        # ~50 plans' persisted blocks + broadcasts behind, and the
        # async ContextCleaner would otherwise reclaim them DURING the
        # first timed queries (measured +4-19 s on the early queries).
        # The drain policy lives in psweep_spark.caching (ONE place).
        from psweep_spark.caching import clear_query_caches

        clear_query_caches(spark, gc=True)
        time.sleep(3)

    # Median-of-3 timing (VERDICT r8 item 4): single-shot numbers made
    # two consecutive rounds' adjudication hinge on host-noise forensics
    # (uniform 1.24x shifts, 2-6x per-query spikes on identical code).
    # Each query >= REP_MIN_SEC is timed 3x with the standard drain
    # between reps; the recorded time is the MEDIAN and the raw reps are
    # published as dispersion.  Sub-REP_MIN_SEC queries keep one rep —
    # their absolute noise is bounded by the threshold itself.
    REP_MIN_SEC = 0.5
    from psweep_spark.caching import clear_query_caches

    def drain() -> None:
        # the shared session-cache policy (psweep_spark/caching.py):
        # unpersist every registered session-lifetime relation (builders
        # return lazy plans so they can't unpersist themselves), clear
        # the cache, and force a synchronous driver GC so the async
        # ContextCleaner reclaims finished queries' broadcasts NOW
        # instead of taxing whichever later rep hits an allocation wall
        # (measured: shingle-heavy dedups swing 4 s <-> 39 s without it).
        clear_query_caches(spark, gc=True)
        time.sleep(0.8)

    timings: dict[str, float] = {}
    query_reps: dict[str, list[float]] = {}
    shuffle_mb: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        stage_floor = max_stage_id()
        reps: list[float] = []
        try:
            while len(reps) < 3:
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                reps.append(round(time.perf_counter() - t0, 4))
                if len(reps) == 1:
                    # shuffle volume is rep-invariant; record rep 1's
                    # (read AFTER the timer stops — zero timed cost)
                    mb = shuffle_since(stage_floor)
                    if mb is not None:
                        shuffle_mb[name] = mb
                    if reps[0] < REP_MIN_SEC:
                        break
                if len(reps) < 3:
                    drain()
            timings[name] = sorted(reps)[len(reps) // 2]
            query_reps[name] = reps
        except Exception as e:  # noqa: BLE001
            print(f"# bench error {name}: {str(e)[:200]}", file=sys.stderr)
            timings[name] = -1.0
        drain()

    ok = {k: v for k, v in timings.items() if v >= 0}
    total = round(sum(ok.values()), 4)
    # The driver's output capture may keep only the head OR only the
    # tail of stdout; a single ~4 KB JSON line was truncated in r01 and
    # parsed as null.  Emit a SHORT summary line first, the full
    # per-query detail line second, and the identical summary line again
    # last — whichever end survives capture contains a parseable
    # headline metric.
    summary = json.dumps(
        {
            "metric": "headline_queries_total_sec",
            "value": total,
            "unit": "sec",
            "sf": sf_val,
            "queries_ok": len(ok),
            "queries_total": len(timings),
        }
    )
    detail = json.dumps(
        {
            "metric": "headline_queries_total_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "query_reps": query_reps,
            "shuffle_write_mb": shuffle_mb,
            "sf": sf_val,
        }
    )
    # Capture-safe per-query chunks (VERDICT r11 "what's wrong" #1 /
    # "next round" #2): the single ~8 KB detail line exceeds the
    # driver's stdout capture window, so its per-query round-over-round
    # diff has been blind for two rounds.  Emit the per-query medians
    # as several short JSON lines (≤ ~1.3 KB each) and print the full
    # chunk set on BOTH sides of the detail line — whichever end of
    # stdout survives a head/tail capture contains one complete set.
    # The summary and detail lines (and their order) are unchanged.
    chunks: list[dict[str, float]] = []
    cur: dict[str, float] = {}
    for k in sorted(timings):
        cur[k] = timings[k]
        if len(json.dumps(cur)) > 1200:
            chunks.append(cur)
            cur = {}
    if cur:
        chunks.append(cur)
    chunk_lines = [
        json.dumps(
            {
                "metric": "headline_queries_chunk",
                "i": i + 1,
                "n_chunks": len(chunks),
                "queries": c,
                "sf": sf_val,
            }
        )
        for i, c in enumerate(chunks)
    ]
    print(summary)
    for line in chunk_lines:
        print(line)
    print(detail)
    for line in chunk_lines:
        print(line)
    print(summary)
    # sidecar: the full detail line always lands on disk next to this
    # script.  UNTRACKED path (VERDICT r11 "next round" #10): the old
    # tracked bench_queries.json was overwritten by every driver run,
    # leaving the tree permanently dirty; committed quiet-host records
    # are copied to bench_queries.json deliberately instead.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_queries_last.json"), "w"
        ) as fh:
            fh.write(detail + "\n")
    except OSError as e:
        print(f"# bench sidecar write failed: {e}", file=sys.stderr)
    sys.stdout.flush()
    return 0 if len(ok) == len(timings) else 1


if __name__ == "__main__":
    raise SystemExit(main())

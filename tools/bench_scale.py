"""Scale-curve bench (VERDICT r3 item 6, widened per r4 item 4): run
the most expensive headline queries at sf0.1 and sf1 (10x data,
tools/gen_scale_data.py) and record the growth ratio of each — for
BOTH wall time and shuffle-write bytes.

A query scaling ~linearly in rows should grow ~10x MINUS its fixed
overhead (session/job scheduling dominates many sf0.1 numbers, so
time ratios well under 10 are expected); anything well PAST 10x is
flagged as super-linear for a plan fix or a documented reason.  The
shuffle-bytes ratio closes the loophole the r4 verdict named: a
sub-linear WALL time (fixed overhead amortizing) can hide a
super-linear SHUFFLE that would dominate at 100x — bytes have no fixed
overhead, so their ratio is the honest data-growth signal.

Writes BENCH_SCALE.json:
{query: {"sf0.1_sec", "sf1_sec", "ratio", "sf0.1_shuffle_mb",
         "sf1_shuffle_mb", "shuffle_ratio", "flag_superlinear",
         "flag_shuffle_superlinear"}}

Usage: python tools/bench_scale.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from psweep_spark.session import get_spark  # noqa: E402

# the ~30 most expensive headline queries from the r4/r5 bench, plus
# representative cheap ones (q1 agg, text scoring) as linear references
DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q9_product_profit",
    "text_quality_scores",
    "events_resample_1min",
    "events_sessionization",
    "events_cogroup_asof",
    "stream_tumbling_counts",
    "stream_view_purchase_join",
    "stream_dedup_events",
    "stream_near_dedup_docs",
    "stream_feed_compaction",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "docs_substring_dup",
    "docs_substring_dup_w64",
    # headline dedup_clusters is the LSH-fed path since r6 (VERDICT r5
    # item 3); the quadratic dedup_clusters_exact is deliberately NOT in
    # the scale set — it is the documented small-SF oracle twin (63×
    # wall at sf1→sf10 in BENCH_SCALE r5 under its old headline name)
    "dedup_clusters",
    "dedup_incremental_batch",
    "corpus_bigram_pmi",
    "corpus_bpe_merges",
    "docs_lm_perplexity",
    "docs_decontaminate",
    "docs_decontaminate_fuzzy",
    "docs_quality_classifier",
    "docs_dsir_weights",
    "multimodal_phash_pairs",
    "embedding_near_dup",
    "embed_kmeans_lloyd",
    "semdedup_kmeans",
    "semdedup_kmeans_scaled",
    "sim_lsh_recall",
    "sim_ivfpq_ann",
    "pq_kmeans_codes",
    "pipeline_training_samples",
]

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get(
    "SPARK_GRAFT_SF1_DIR", os.path.join(REPO, "scale_data", "sf1")
)
# time-ratio threshold: 10x data with fixed overhead amortizing away
# should land well under this; past it the query grows super-linearly.
FLAG_RATIO = 14.0
# shuffle bytes have no fixed overhead, so the honest linear bound is
# ~10x; leave headroom for partition-count granularity effects.
FLAG_SHUFFLE_RATIO = 12.0
# ignore shuffle ratios on tiny absolute volumes (< 8 MB at sf1):
# constant-size control-plane shuffles (centroid pulls, 1-row tops)
# produce meaningless ratios
MIN_SHUFFLE_MB = 8.0


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    import psweep_spark.queries_catalog as qc

    spark = get_spark(
        app_name="bench-scale",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "true",
            # a multi-hundred-stage run must not evict completed stages
            # mid-measurement: eviction makes the cumulative counter go
            # BACKWARDS (observed as negative per-query deltas)
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    sc = spark.sparkContext

    def shuffle_total() -> float | None:
        """Cumulative shuffle-write MB across completed stages (REST)."""
        try:
            url = (f"{sc.uiWebUrl}/api/v1/applications/"
                   f"{sc.applicationId}/stages?status=complete")
            stages = json.load(urllib.request.urlopen(url, timeout=10))
            return sum(s["shuffleWriteBytes"] for s in stages) / 1048576
        except Exception:  # noqa: BLE001
            return None

    def drain():
        # shared session-cache policy: psweep_spark/caching.py
        from psweep_spark.caching import clear_query_caches

        clear_query_caches(spark, gc=True)

    def timed(fn, sf_dir: str) -> tuple[float, float | None]:
        drain()
        time.sleep(0.5)  # let stage reporting settle before the snapshot
        s0 = shuffle_total()
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = round(time.perf_counter() - t0, 3)
        time.sleep(0.5)
        s1 = shuffle_total()
        mb = round(s1 - s0, 3) if s0 is not None and s1 is not None else None
        return dt, mb

    # warm the JVM/codegen on the small sf
    for name in names:
        try:
            qc.QUERIES[name](spark, "/root/testdata/sf0.001").collect()
        except Exception as e:  # noqa: BLE001
            print(f"# warm error {name}: {str(e)[:120]}", file=sys.stderr)
    drain()

    out: dict[str, dict] = {}
    for name in names:
        fn = qc.QUERIES.get(name)
        if fn is None:
            continue
        try:
            # second run of each is the measured one (file cache warm,
            # matching the steady state the ratio should compare)
            timed(fn, SF01)
            t_small, mb_small = timed(fn, SF01)
            timed(fn, SF1)
            t_big, mb_big = timed(fn, SF1)
        except Exception as e:  # noqa: BLE001
            print(f"# bench error {name}: {str(e)[:200]}", file=sys.stderr)
            out[name] = {"error": str(e)[:200]}
            continue
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        sratio = (
            round(mb_big / mb_small, 2)
            if mb_small and mb_big is not None and mb_small > 0
            else None
        )
        shuffle_flag = bool(
            sratio
            and sratio > FLAG_SHUFFLE_RATIO
            and (mb_big or 0) >= MIN_SHUFFLE_MB
        )
        out[name] = {
            "sf0.1_sec": t_small,
            "sf1_sec": t_big,
            "ratio": ratio,
            "sf0.1_shuffle_mb": mb_small,
            "sf1_shuffle_mb": mb_big,
            "shuffle_ratio": sratio,
            "flag_superlinear": bool(ratio and ratio > FLAG_RATIO),
            "flag_shuffle_superlinear": shuffle_flag,
        }
        print(
            f"{name}: {t_small}s -> {t_big}s  ratio {ratio}"
            f"  shuffle {mb_small} -> {mb_big} MB  ratio {sratio}"
            + ("  ** SUPER-LINEAR TIME" if out[name]["flag_superlinear"] else "")
            + ("  ** SUPER-LINEAR SHUFFLE" if shuffle_flag else "")
        )

    path = os.path.join(REPO, "BENCH_SCALE.json")
    merged: dict[str, dict] = {}
    if os.path.isfile(path):
        with open(path) as fh:
            merged = json.load(fh)
    merged.update(out)
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=2, sort_keys=True)
    print("wrote BENCH_SCALE.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

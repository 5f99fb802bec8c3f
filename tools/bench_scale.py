"""Scale-curve bench (VERDICT r3 item 6): run the most expensive
headline queries at sf0.1 and sf1 (10x data, tools/gen_scale_data.py)
and record the growth ratio of each.

A query scaling ~linearly in rows should grow ~10x MINUS its fixed
overhead (session/job scheduling dominates many sf0.1 numbers, so
ratios well under 10 are expected); anything well PAST 10x is flagged
as super-linear for a plan fix or a documented reason.

Writes BENCH_SCALE.json: {query: {sf0.1: s, sf1: s, ratio: r, flag: bool}}.

Usage: python tools/bench_scale.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from psweep_spark.session import get_spark  # noqa: E402

# top-cost headline queries from the r3/r4 bench, plus representative
# cheap ones (q1 agg, text scoring) as linear-scaling references
DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q9_product_profit",
    "text_quality_scores",
    "events_resample_1min",
    "events_sessionization",
    "stream_tumbling_counts",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "docs_substring_dup",
    "docs_substring_dup_w64",
    "dedup_clusters",
    "dedup_incremental_batch",
    "corpus_bigram_pmi",
    "sim_lsh_recall",
    "sim_ivfpq_ann",
    "pq_kmeans_codes",
    "pipeline_training_samples",
]

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get(
    "SPARK_GRAFT_SF1_DIR", os.path.join(REPO, "scale_data", "sf1")
)
# ratio threshold: 10x data with fixed overhead amortizing away should
# land well under this; past it the query grows super-linearly
FLAG_RATIO = 14.0


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    import psweep_spark.queries_catalog as qc

    spark = get_spark(app_name="bench-scale", shuffle_partitions=32)
    jvm = spark.sparkContext._jvm  # noqa: SLF001

    def drain():
        spark.catalog.clearCache()
        jvm.System.gc()

    def timed(fn, sf_dir: str) -> float:
        drain()
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        return round(time.perf_counter() - t0, 3)

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
            t_small = timed(fn, SF01)
            timed(fn, SF1)
            t_big = timed(fn, SF1)
        except Exception as e:  # noqa: BLE001
            print(f"# bench error {name}: {str(e)[:200]}", file=sys.stderr)
            out[name] = {"error": str(e)[:200]}
            continue
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        out[name] = {
            "sf0.1_sec": t_small,
            "sf1_sec": t_big,
            "ratio": ratio,
            "flag_superlinear": bool(ratio and ratio > FLAG_RATIO),
        }
        print(f"{name}: {t_small}s -> {t_big}s  ratio {ratio}"
              + ("  ** SUPER-LINEAR" if out[name]["flag_superlinear"] else ""))

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

#!/usr/bin/env python
"""Streaming-drain profiler (round 12, guide §1 measure-first).

For each streaming query, attaches a StreamingQueryListener and records
every micro-batch's progress: batchId, numInputRows, durationMs
breakdown (addBatch / getBatch / latestOffset / queryPlanning /
triggerExecution / walCommit / commitOffsets), plus total driver jobs
and wall time per query — the evidence base for attacking the per-batch
floor (VERDICT r11 "next round" #1).

Usage: python tools/profile_drains.py [--tag before] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DRAINS = [
    "stream_tumbling_counts",
    "stream_view_purchase_join",
    "stream_dedup_events",
    "stream_static_enrich",
    "stream_near_dedup_docs",
    "stream_feed_compaction",
    "stream_ols_trend",
    "stream_cms_freq",
]


def main() -> int:
    args = list(sys.argv[1:])
    tag = "before"
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        else:
            names.append(a)
    if not names:
        names = list(DRAINS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQueryListener

    from psweep_spark.caching import clear_query_caches
    from psweep_spark.plans import jobs_run
    from psweep_spark.session import get_spark

    spark = get_spark("psweep-spark-drainprof")
    queries = entrymod.queries()

    progress: list[dict] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            try:
                progress.append(json.loads(p.json))
            except Exception:  # noqa: BLE001
                pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(Capture())

    # bench-identical warmup
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").agg(F.sum("l_quantity")).collect()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.limit(256).mapInPandas(lambda it: it, docs.schema).count()
    for _prov in ("stream_near_dedup_docs", "stream_feed_compaction",
                  "stream_cms_freq"):
        if _prov in queries and _prov in names:
            try:
                queries[_prov](spark, sf_dir).count()
            except Exception:  # noqa: BLE001
                pass
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in names:
            fn = queries.get(name)
            if fn is None:
                continue
            try:
                fn(spark, warm_dir).collect()
            except Exception:  # noqa: BLE001
                pass
        clear_query_caches(spark, gc=True)
        time.sleep(2)

    out: dict[str, dict] = {}
    for name in names:
        fn = queries.get(name)
        if fn is None:
            continue
        for rep in range(2):
            progress.clear()
            spark.sparkContext.setJobDescription(f"drainprof:{name}")
            t0 = time.perf_counter()
            (df, njb), = [jobs_run(spark, lambda: fn(spark, sf_dir))]
            build_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            _, njc = jobs_run(spark, lambda: df.collect())
            collect_s = time.perf_counter() - t0
            time.sleep(0.5)  # let async listener events land
            batches = [
                {
                    "batchId": p.get("batchId"),
                    "rows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs"),
                    "stateOperators": [
                        {
                            "numRowsTotal": s.get("numRowsTotal"),
                            "commitTimeMs": s.get("commitTimeMs"),
                            "numShufflePartitions": s.get(
                                "numShufflePartitions"
                            ),
                        }
                        for s in p.get("stateOperators", [])
                    ],
                }
                for p in progress
            ]
            row = {
                "build_s": round(build_s, 3),
                "collect_s": round(collect_s, 3),
                "jobs_build": njb,
                "jobs_collect": njc,
                "n_batches": len(batches),
                "batches": batches,
            }
            out.setdefault(name, {})[f"rep{rep}"] = row
            clear_query_caches(spark, gc=True)
            time.sleep(0.5)
        print(json.dumps({name: out[name]["rep1"]}), flush=True)

    path = os.path.join(REPO, f"PROFILE_DRAINS_{tag}_r12.json")
    with open(path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "queries": out}, fh, indent=1,
                  sort_keys=True)
    print(f"# wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

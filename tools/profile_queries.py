#!/usr/bin/env python
"""Per-query optimization profiler (round 11).

For each named query (default: every headline query), measures with the
bench's own methodology (warmed session, drained caches):

- ``build_s``   — driver-side plan construction (the query fn call)
- ``collect_s`` — execution wall time (same timed action as bench.py)
- ``noop_s``    — noop-sink wall time (guide §1.4; optional, --noop)
- ``jobs``      — driver jobs scheduled by the collect
- ``exchanges`` — distinct shuffle exchanges in the executed plan
- ``shuffle_mb``— shuffle bytes written (AppStatusStore, as bench.py)

and dumps ``.explain("formatted")`` to ``plans/r11/<q>_<tag>.txt``.

Usage: python tools/profile_queries.py [--tag before] [--noop]
           [--sf DIR] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    tag = "before"
    noop = False
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--noop":
            noop = True
        elif a == "--sf":
            sf_dir = next(it)
        else:
            names.append(a)

    import bench as benchmod
    import __spark_entry__ as entrymod
    from psweep_spark.session import get_spark
    from psweep_spark.caching import clear_query_caches
    from psweep_spark.plans import (
        count_exchanges,
        formatted_plan,
        jobs_run,
    )

    spark = get_spark("psweep-spark-profile")
    queries = entrymod.queries()
    if not names:
        names = list(benchmod.HEADLINE)

    rnd = os.environ.get("PSQ_PROFILE_ROUND", "r12")
    plans_dir = os.path.join(REPO, "plans", rnd)
    os.makedirs(plans_dir, exist_ok=True)

    # Same warmup as bench.py: JVM/codegen/Arrow init + memoized landings.
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").agg(F.sum("l_quantity")).collect()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.limit(256).mapInPandas(lambda it: it, docs.schema).count()
    for _prov in (
        "multimodal_binaryfile_ingest",
        "stream_near_dedup_docs",
        "stream_feed_compaction",
        "sim_ivf_delete_serve",
        "stream_cms_freq",
    ):
        if _prov in queries and _prov in names:
            try:
                queries[_prov](spark, sf_dir).count()
            except Exception:  # noqa: BLE001
                pass
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.realpath(warm_dir) != os.path.realpath(sf_dir):
        for name in names:
            fn = queries.get(name)
            if fn is None:
                continue
            try:
                fn(spark, warm_dir).collect()
            except Exception:  # noqa: BLE001
                pass
        clear_query_caches(spark, gc=True)
        time.sleep(3)

    out: dict[str, dict] = {}
    for name in names:
        fn = queries.get(name)
        if fn is None:
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        row: dict = {}
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            row["build_s"] = round(time.perf_counter() - t0, 4)

            t0 = time.perf_counter()
            _, nj = jobs_run(spark, lambda: df.collect())
            row["collect_s"] = round(time.perf_counter() - t0, 4)
            row["jobs"] = nj

            # plan AFTER execution (AQE final), before drain
            try:
                row["exchanges"] = count_exchanges(df)
                with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
                    fh.write(formatted_plan(df))
            except Exception as e:  # noqa: BLE001
                row["plan_err"] = str(e)[:120]

            if noop:
                clear_query_caches(spark, gc=True)
                time.sleep(0.3)
                df2 = fn(spark, sf_dir)
                t0 = time.perf_counter()
                df2.write.format("noop").mode("overwrite").save()
                row["noop_s"] = round(time.perf_counter() - t0, 4)

            # rep2 collect on a FRESH plan after drain (steady-state)
            clear_query_caches(spark, gc=True)
            time.sleep(0.3)
            t0 = time.perf_counter()
            df3 = fn(spark, sf_dir)
            build2 = time.perf_counter() - t0
            t0 = time.perf_counter()
            df3.collect()
            row["collect2_s"] = round(time.perf_counter() - t0, 4)
            row["build2_s"] = round(build2, 4)
        except Exception as e:  # noqa: BLE001
            row["err"] = str(e)[:200]
        out[name] = row
        clear_query_caches(spark, gc=True)
        time.sleep(0.3)
        print(json.dumps({name: row}), flush=True)

    path = os.path.join(REPO, f"PROFILE_{tag}_{rnd}.json")
    with open(path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "queries": out}, fh, indent=1, sort_keys=True)
    print(f"# wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

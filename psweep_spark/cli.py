"""Command-line sinks — Spark-first re-expression of the reference CLIs
(`/root/reference/bin/psweep-db2json`, `bin/psweep-db2table`,
`src/psweep/cli.py` check_calc_dir).

Usage::

    python -m psweep_spark.cli db2json  <database_dir> [-o OUT_DIR]
    python -m psweep_spark.cli db2table <database_dir> [-a] [column ...]
    python -m psweep_spark.cli check-calc-dir <calc_dir>
"""

from __future__ import annotations

import argparse
import os
import sys


def _load(db_path: str):
    from .database import Database
    from .session import get_spark

    spark = get_spark("psweep-spark-cli")
    df = Database(db_path).load(spark)
    if df is None:
        print(f"error: no database at {db_path}", file=sys.stderr)
        raise SystemExit(2)
    return spark, df


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="psweep-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pj = sub.add_parser("db2json", help="database → JSON lines")
    pj.add_argument("database")
    pj.add_argument("-o", "--out", default=None,
                    help="output dir (distributed write); default: stdout")

    pt = sub.add_parser("db2table", help="database → text table")
    pt.add_argument("database")
    pt.add_argument("-a", "--all-cols", action="store_true",
                    help="include _prefix bookkeeping columns")
    pt.add_argument("columns", nargs="*", help="column selection")

    pc = sub.add_parser("check-calc-dir", help="reconcile DB vs calc dir")
    pc.add_argument("calc_dir")
    pc.add_argument("--database", default=None,
                    help="database dir (default <calc_dir>/database)")

    args = p.parse_args(argv)

    if args.cmd == "db2json":
        from .query import df_to_json

        _, df = _load(args.database)
        if args.out:
            df_to_json(df, args.out)
        else:
            for line in df_to_json(df) or []:
                print(line)
        return 0

    if args.cmd == "db2table":
        from .query import df_to_table

        _, df = _load(args.database)
        print(df_to_table(df, prefix_cols=args.all_cols, cols=args.columns))
        return 0

    if args.cmd == "check-calc-dir":
        import json

        from .query import check_calc_dir

        db_path = args.database or os.path.join(args.calc_dir, "database")
        _, df = _load(db_path)
        print(json.dumps(check_calc_dir(args.calc_dir, df), indent=2))
        return 0

    return 1  # pragma: no cover


if __name__ == "__main__":
    raise SystemExit(main())

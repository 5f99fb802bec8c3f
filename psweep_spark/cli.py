"""Command-line sinks — Spark-first re-expression of the reference CLIs
(`/root/reference/bin/psweep-db2json`, `bin/psweep-db2table`,
`src/psweep/cli.py` check_calc_dir).

Usage::

    python -m psweep_spark.cli db2json  <database_dir> [-o ORIENT] [--out PATH]
    python -m psweep_spark.cli db2table <database_dir> [-a] [column ...]
    python -m psweep_spark.cli check-calc-dir <calc_dir>
    python -m psweep_spark.cli sync <src> <dst> [--dry-run] [--exclude GLOB ...]

``sync`` replaces the reference's rsync push/pull pair
(`/root/reference/bin/psweep-push:1-24`, `bin/psweep-pull:52-77`): under
shared storage there is usually nothing to sync, but moving a study
between storage tiers (laptop → object store, cluster → archive) is the
same ergonomic need.  It copies through the Hadoop FileSystem API, so
src/dst accept ANY scheme the Spark runtime knows — ``file://``,
``hdfs://``, ``s3a://`` — not just local paths.  For petabyte trees use
the platform's native distcp/replication; this is the thin study-sized
tool."""

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

    pj = sub.add_parser("db2json", help="database → JSON")
    pj.add_argument("database")
    pj.add_argument(
        "-o", "--orient", default="records",
        choices=["records", "split", "index", "columns", "values"],
        help="pandas to_json orient (reference psweep-db2json -o); "
        "records = JSON lines (scale path), others = one document",
    )
    pj.add_argument("--out", default=None,
                    help="output dir/file (records: distributed write); "
                    "default: stdout")

    pt = sub.add_parser("db2table", help="database → text table")
    pt.add_argument("database")
    pt.add_argument("-a", "--all-cols", action="store_true",
                    help="include _prefix bookkeeping columns")
    pt.add_argument("columns", nargs="*", help="column selection")

    pc = sub.add_parser("check-calc-dir", help="reconcile DB vs calc dir")
    pc.add_argument("calc_dir")
    pc.add_argument("--database", default=None,
                    help="database dir (default <calc_dir>/database)")

    psync = sub.add_parser(
        "sync",
        help="copy a study dir between storage locations "
        "(reference psweep-push/pull replacement; any Hadoop FS scheme)",
    )
    psync.add_argument("src")
    psync.add_argument("dst")
    psync.add_argument("-n", "--dry-run", action="store_true",
                       help="list what would be copied")
    psync.add_argument(
        "--exclude", action="append", default=[], metavar="GLOB",
        help="skip files whose tree-relative path matches GLOB "
        "(repeatable; rsync-exclude analog of reference "
        "psweep-pull rule files, bin/psweep-pull:52-77). "
        "'tmpsave/*' also matches inside nested dirs.",
    )

    args = p.parse_args(argv)

    if args.cmd == "db2json":
        from .query import df_to_json

        _, df = _load(args.database)
        out = df_to_json(df, path=args.out, orient=args.orient)
        if isinstance(out, list):
            for line in out:
                print(line)
        elif out is not None:
            print(out)
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

    if args.cmd == "sync":
        n, total = sync_paths(
            args.src, args.dst, dry_run=args.dry_run, exclude=args.exclude
        )
        verb = "would copy" if args.dry_run else "copied"
        print(f"{verb} {n} files ({total} bytes) {args.src} -> {args.dst}")
        return 0

    return 1  # pragma: no cover


def sync_paths(
    src: str,
    dst: str,
    dry_run: bool = False,
    exclude: list[str] | None = None,
) -> tuple[int, int]:
    """Mirror ``src`` (file or tree) to ``dst`` via the Hadoop
    FileSystem API.  rsync-like and IDEMPOTENT: each source file copies
    to ``dst/<relative path>`` with overwrite, so re-running converges
    instead of nesting ``dst/<basename(src)>`` the way a whole-tree
    ``FileUtil.copy`` into an existing directory would.

    ``exclude``: fnmatch globs tested against the tree-relative path
    AND its path suffixes, so ``tmpsave/*`` skips a tmpsave dir at any
    depth — the ergonomics of the reference's rsync exclude rules
    (``/root/reference/bin/psweep-pull:52-77``) without an rsync
    dependency.  Returns (file_count, byte_count) of the copied set."""
    import fnmatch
    from .session import get_spark

    spark = get_spark("psweep-spark-cli")
    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    HPath = jvm.org.apache.hadoop.fs.Path
    FileUtil = jvm.org.apache.hadoop.fs.FileUtil
    src_path, dst_path = HPath(src), HPath(dst)
    src_fs = src_path.getFileSystem(conf)
    dst_fs = dst_path.getFileSystem(conf)
    if not src_fs.exists(src_path):
        raise FileNotFoundError(src)

    src_uri = src_fs.makeQualified(src_path).toString().rstrip("/")

    def _excluded(rel: str) -> bool:
        parts = rel.split("/")
        suffixes = ["/".join(parts[i:]) for i in range(len(parts))]
        return any(
            fnmatch.fnmatch(s, pat) for pat in (exclude or []) for s in suffixes
        )

    n = total = 0
    it = src_fs.listFiles(src_path, True)  # recursive
    while it.hasNext():
        st = it.next()
        f = st.getPath()
        fs_str = f.toString()
        rel = fs_str[len(src_uri):].lstrip("/") if fs_str != src_uri else f.getName()
        if _excluded(rel):
            continue
        n += 1
        total += st.getLen()
        if dry_run:
            print(f"  {fs_str} -> {dst}/{rel} ({st.getLen()} bytes)")
        else:
            FileUtil.copy(
                src_fs, f, dst_fs, HPath(f"{dst}/{rel}"), False, True, conf
            )
    return n, total


if __name__ == "__main__":
    raise SystemExit(main())

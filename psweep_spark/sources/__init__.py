"""Source / sink surface — SURVEY §2.3 #27/#40.

The experiment database itself lives in `psweep_spark.database`
(Parquet, append, mergeSchema).  This module holds:

* format-generic table readers/writers (parquet | json | csv | orc) so the
  query surface runs over any of the reference's export formats;
* the driver-testdata loaders shared by catalog/bench/tests (including
  the nanosecond-timestamp events table);
* small driver/executor-side file helpers matching the reference's
  `file_write/pickle_write/json_write` utilities
  (`/root/reference/src/psweep/psweep.py:154-185` — mkdir -p semantics).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_table",
    "write_table",
    "load_testdata",
    "load_events",
    "file_write",
    "file_read",
    "pickle_write",
    "pickle_read",
    "json_write",
    "json_read",
]

_FORMATS = ("parquet", "json", "csv", "orc")


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", **options: Any
) -> DataFrame:
    """Format-generic reader; parquet merges schemas (union-of-keys)."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    r = spark.read
    if fmt == "parquet":
        r = r.option("mergeSchema", "true")
    if fmt == "csv":
        r = r.option("header", "true").option("inferSchema", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return getattr(r, fmt)(path)


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite",
    **options: Any,
) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.option("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    getattr(w, fmt)(path)


def load_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """One driver-testdata table; `events` gets its nanos→µs fix."""
    if table == "events":
        return load_events(spark, sf_dir)
    # Naive parquet timestamps surface as TIMESTAMP (not NTZ): session tz
    # is UTC so the epoch is unchanged, and the reader-level conf (unlike
    # a post-read cast) keeps timestamp filter pushdown intact.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet: TIMESTAMP(NANOS) generations read nanos as long,
    truncated to µs (matches DuckDB's CAST(ts_ns AS TIMESTAMP));
    TIMESTAMP(MICROS) generations read directly as TIMESTAMP."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev


# -- local file helpers (reference psweep.py:154-185) ------------------------


def _makedirs_for(path: str) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)


def file_write(path: str, txt: str) -> None:
    _makedirs_for(path)
    with open(path, "w") as fh:
        fh.write(txt)


def file_read(path: str) -> str:
    with open(path) as fh:
        return fh.read()


def pickle_write(path: str, obj: Any) -> None:
    _makedirs_for(path)
    with open(path, "wb") as fh:
        pickle.dump(obj, fh)


def pickle_read(path: str) -> Any:
    with open(path, "rb") as fh:
        return pickle.load(fh)


def json_write(path: str, obj: Any, **kwds: Any) -> None:
    _makedirs_for(path)
    with open(path, "w") as fh:
        json.dump(obj, fh, **kwds)


def json_read(path: str) -> Any:
    with open(path) as fh:
        return json.load(fh)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED table: rows are hash-partitioned into
    ``num_buckets`` files per partition by ``bucket_cols`` at write
    time.  Two tables bucketed the same way equi-join WITHOUT any
    exchange — the co-location replaces the shuffle, the single biggest
    cost of repeated fact⋈fact joins at 100 TB (pay the shuffle once at
    ingest, never again).  With ``sort_cols`` the sort is also free.

    Catalog-backed (``saveAsTable``) because bucket metadata lives in
    the table catalog, not the files."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sc)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its bucket spec intact (must go
    through the catalog — ``spark.read.parquet`` on the files would
    lose the co-location metadata)."""
    return spark.table(table)

"""Append-only experiment database over Parquet — SURVEY §2 #27-28, M0.

Replaces the reference's pickled pandas DataFrame
(``/root/reference/src/psweep/psweep.py:36,1334-1336,1478-1488``) with a
Parquet table:

* **append** = write new part files (``mode=append``), partitioned by
  ``_run_id`` → partition pruning for per-run queries, no rewrite of
  history on the hot path.
* **union-of-keys schema evolution** (reference ``df_update_pset_cols``,
  psweep.py:690-710): new result columns appear via parquet
  ``mergeSchema`` on read (absent-in-old-files → NULL, which reproduces
  the ``FILL_VALUE = pd.NA`` back-fill).  New *pset* columns trigger a
  one-time rewrite because every historical ``_pset_hash`` must be
  recomputed over the widened pset column set (psweep.py:1432-1437;
  tests/test_all.py:1476-1524).  Scale note: pset-schema widening is a
  rare, human-initiated event; the rewrite is a single distributed
  read→withColumn→write job, not a driver loop.
* type conflicts across appends are an error (typed core replaces the
  reference's dtype=object wash, SURVEY §1.2).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import df_hash_expr, filter_cols

META_BASENAME = "_psweep_meta.json"
DATA_DIRNAME = "data"


class Database:
    """Handle on one experiment database directory."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        self.data_path = os.path.join(self.path, DATA_DIRNAME)
        self.meta_path = os.path.join(self.path, META_BASENAME)

    # -- existence / meta --------------------------------------------------

    def exists(self) -> bool:
        return os.path.isdir(self.data_path) and bool(os.listdir(self.data_path))

    def read_meta(self) -> dict:
        if os.path.isfile(self.meta_path):
            with open(self.meta_path) as fh:
                return json.load(fh)
        return {}

    def write_meta(self, meta: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(self.meta_path, "w") as fh:
            json.dump(meta, fh, indent=2, sort_keys=True, default=str)

    # -- read ----------------------------------------------------------------

    def load(self, spark: SparkSession) -> DataFrame | None:
        """Full table with union-of-keys schema (mergeSchema read)."""
        if not self.exists():
            return None
        return spark.read.option("mergeSchema", "true").parquet(self.data_path)

    def max_seqs(self, spark: SparkSession) -> tuple[int, int]:
        """(max _run_seq, max _pset_seq) or (-1, -1) on empty DB.

        Column-stats only scan — parquet footers answer this without
        reading data pages.
        """
        df = self.load(spark)
        if df is None:
            return (-1, -1)
        row = df.select(
            F.max("_run_seq").alias("r"), F.max("_pset_seq").alias("p")
        ).first()
        return (
            int(row["r"]) if row["r"] is not None else -1,
            int(row["p"]) if row["p"] is not None else -1,
        )

    def distinct_hashes(self, spark: SparkSession) -> DataFrame | None:
        """Distinct ``_pset_hash`` relation for skip-dups anti-joins."""
        df = self.load(spark)
        if df is None:
            return None
        return df.select("_pset_hash").distinct()

    # -- write ---------------------------------------------------------------

    def _check_type_compat(self, old: T.StructType, new: T.StructType) -> None:
        old_types = {f.name: f.dataType for f in old.fields}
        for f in new.fields:
            ot = old_types.get(f.name)
            if ot is not None and ot != f.dataType and not isinstance(
                ot, T.NullType
            ) and not isinstance(f.dataType, T.NullType):
                raise TypeError(
                    f"column {f.name!r} changes type across appends: "
                    f"{ot.simpleString()} -> {f.dataType.simpleString()}; "
                    "the engine's typed core requires type-stable columns "
                    "(cast explicitly, or use a new column name)"
                )

    def append(self, new_df: DataFrame) -> None:
        """Append one run's rows; widen + rehash history if pset cols grew."""
        spark = new_df.sparkSession
        old_df = self.load(spark)
        if old_df is None:
            self._write(new_df, mode="overwrite")
            self.write_meta(
                {"engine": "psweep_spark", "created_utc": time.time()}
            )
            return

        self._check_type_compat(old_df.schema, new_df.schema)
        old_pset = set(filter_cols(old_df.columns))
        new_pset = set(filter_cols(new_df.columns))

        if new_pset - old_pset:
            # pset schema widened: NULL-extend history and recompute every
            # _pset_hash over the union pset col set (reference
            # psweep.py:1432-1437) — requires a one-time table rewrite.
            widened = old_df
            new_types = {f.name: f.dataType for f in new_df.schema.fields}
            for c in sorted(new_pset - old_pset):
                widened = widened.withColumn(c, F.lit(None).cast(new_types[c]))
            all_df = widened.unionByName(new_df, allowMissingColumns=True)
            all_df = all_df.withColumn(
                "_pset_hash", df_hash_expr(all_df.schema)
            )
            self._rewrite(all_df)
        else:
            self._write(new_df, mode="append")

    def _write(self, df: DataFrame, mode: str) -> None:
        (
            df.write.mode(mode)
            .option("compression", "snappy")
            .partitionBy("_run_id")
            .parquet(self.data_path)
        )

    def _rewrite(self, df: DataFrame) -> None:
        tmp = self.data_path + ".rewrite"
        (
            df.write.mode("overwrite")
            .option("compression", "snappy")
            .partitionBy("_run_id")
            .parquet(tmp)
        )
        old = self.data_path + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(self.data_path, old)
        os.rename(tmp, self.data_path)
        shutil.rmtree(old)

    # -- snapshots (reference `backup`, psweep.py:1417-1427) ------------------

    def backup(self, tag: str) -> str:
        """Copy the table to a sibling snapshot dir.

        Local-FS stand-in for table versioning (Delta time travel /
        Iceberg snapshots are the cluster-scale mechanism — no copy).
        """
        dst = f"{self.path}.bak_{tag}"
        shutil.copytree(self.path, dst)
        return dst

    def clone_to(self, dst_path: str) -> "Database":
        """Copy DB to a new location (reference `simulate` shadow DB)."""
        dst = Database(dst_path)
        if os.path.isdir(dst.path):
            shutil.rmtree(dst.path)
        if os.path.isdir(self.path):
            shutil.copytree(self.path, dst.path)
        return dst

    # -- maintenance ---------------------------------------------------------

    def compact(self, spark: SparkSession, target_file_mb: int = 128) -> int:
        """Small-file compaction: rewrite the table so each ``_run_id``
        partition holds ~``target_file_mb``-sized files.

        Every incremental ``run()`` appends its own files; after
        thousands of runs the table is dominated by kilobyte files and
        scan planning/open overhead — the classic small-file problem of
        append-heavy stores.  Compaction = read + coalesce to
        ``ceil(bytes / target)`` output files per partition + atomic
        swap (same swap path as schema-evolve rewrites).  Returns the
        file count after compaction.

        At 100 TB this runs per-partition (only recent ``_run_id``
        partitions fragment; old ones stay untouched) — here the local
        table is small enough to rewrite whole."""
        df = self.load(spark)
        if df is None:
            return 0
        total_bytes = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(self.data_path)
            for f in files
        )
        n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
        self._rewrite(df.repartition(int(n_files)))
        return sum(
            1
            for root, _, files in os.walk(self.data_path)
            for f in files
            if f.endswith(".parquet")
        )

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
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import df_hash_expr, filter_cols
from .metastore import LocalFSMetaStore, MetaStore

META_BASENAME = "_psweep_meta.json"
META_VERSION_PREFIX = "_psweep_meta.v"
DATA_DIRNAME = "data"
LOCK_BASENAME = ".writer_lock"


class Database:
    """Handle on one experiment database directory.

    ``meta_store`` overrides the commit-metadata backend (default:
    :class:`LocalFSMetaStore` over the db dir).  All commit metadata —
    seq watermarks, the advisory writer lock — goes through the store's
    conditional-put primitive, so pointing this at an object-store
    implementation makes the commit protocol S3-safe (see
    psweep_spark/metastore.py)."""

    #: process-wide override for the default store backend, keyed by db
    #: path (tests inject the simulated object store here; deployments
    #: point it at their real store implementation once, instead of
    #: threading meta_store through every call site)
    default_store_factory = None

    def __init__(self, path: str, meta_store: MetaStore | None = None):
        self.path = os.path.abspath(path)
        self.data_path = os.path.join(self.path, DATA_DIRNAME)
        self.meta_path = os.path.join(self.path, META_BASENAME)
        if meta_store is None:
            factory = type(self).default_store_factory
            meta_store = (
                factory(self.path) if factory is not None
                else LocalFSMetaStore(self.path)
            )
        self.meta_store = meta_store

    # -- existence / meta --------------------------------------------------

    def exists(self) -> bool:
        return os.path.isdir(self.data_path) and bool(os.listdir(self.data_path))

    def _meta_version(self) -> int:
        """Highest committed manifest version, or -1 if none."""
        keys = self.meta_store.list_keys(META_VERSION_PREFIX)
        if not keys:
            return -1
        return max(
            int(k[len(META_VERSION_PREFIX):].split(".")[0]) for k in keys
        )

    @staticmethod
    def _meta_key(version: int) -> str:
        return f"{META_VERSION_PREFIX}{version:012d}.json"

    def read_meta(self) -> dict:
        """Current committed metadata: the highest versioned manifest,
        falling back to a legacy un-versioned ``_psweep_meta.json``
        (pre-CAS databases) when no manifest exists."""
        v = self._meta_version()
        if v >= 0:
            raw = self.meta_store.get(self._meta_key(v))
            if raw is not None:
                return json.loads(raw)
        if os.path.isfile(self.meta_path):
            with open(self.meta_path) as fh:
                return json.load(fh)
        return {}

    def update_meta(self, mutate, max_retries: int = 256) -> dict:
        """Commit a metadata update via versioned-manifest CAS.

        ``mutate(meta) -> meta`` is applied to the CURRENT committed
        metadata and the result is conditional-put as version N+1.
        First writer wins; on conflict the loop re-reads and re-applies
        ``mutate`` against the winner's state — so racing writers
        serialize without any lock, on any store with conditional put.
        Returns the committed dict.  ``mutate`` may run several times
        and must be side-effect-free apart from its return value (any
        bookkeeping it records should be overwritten on re-run)."""
        for _ in range(max_retries):
            v = self._meta_version()
            meta = mutate(dict(self.read_meta()))
            payload = json.dumps(
                meta, indent=2, sort_keys=True, default=str
            ).encode()
            if self.meta_store.put_if_absent(self._meta_key(v + 1), payload):
                self._write_legacy_meta(meta)
                return meta
        raise RuntimeError(
            f"metadata CAS for {self.path} lost {max_retries} races; "
            "pathological writer contention"
        )

    def _write_legacy_meta(self, meta: dict) -> None:
        """Best-effort human-readable snapshot at the legacy path (the
        versioned manifests are the source of truth)."""
        try:
            os.makedirs(self.path, exist_ok=True)
            tmp = self.meta_path + f".tmp-{os.getpid()}"
            with open(tmp, "w") as fh:
                json.dump(meta, fh, indent=2, sort_keys=True, default=str)
            os.replace(tmp, self.meta_path)
        except OSError:
            pass

    def write_meta(self, meta: dict) -> None:
        """Replace the committed metadata wholesale (CAS commit)."""
        self.update_meta(lambda _cur: meta)

    # -- concurrency ---------------------------------------------------------

    @contextmanager
    def writer_lock(
        self,
        timeout: float = 120.0,
        poll: float = 0.05,
        stale_after: float = 3600.0,
    ):
        """Advisory exclusive writer lock (``O_CREAT|O_EXCL`` lockfile).

        Guards the commit-time critical sections only — seq
        reservation and the file moves of :meth:`append` — NEVER the
        user-function compute, so concurrent ``run()`` calls overlap
        their expensive work and serialize only for milliseconds of
        bookkeeping.  The reference is single-process and immune by
        construction (``/root/reference/src/psweep/psweep.py`` holds
        the whole DataFrame in memory); a shared Parquet table needs
        this explicit guard.

        The lock is acquired through the meta store's CONDITIONAL PUT
        (``metastore.MetaStore.put_if_absent``) — the one primitive
        object stores provide — so the same protocol runs on local FS
        (``O_EXCL``), HDFS, and S3/GCS/Azure-style stores.  Note that
        the CRITICAL invariants (seq uniqueness) do NOT depend on this
        lock anymore: :meth:`reserve_seqs` commits through lock-free
        manifest CAS (:meth:`update_meta`); the lock only serializes
        local data-directory moves.

        A lock record older than ``stale_after`` seconds (per the
        timestamp in its payload, not filesystem mtime) is presumed
        abandoned and stolen.  Both the steal and the release go
        through ``MetaStore.delete_if_match`` — a caller only removes
        the exact lock record it observed (stale payload) or wrote
        (its own payload), so a stealer can never delete a FRESH lock
        another waiter just acquired, and a holder that was itself
        stolen from cannot release the successor's lock."""
        deadline = time.monotonic() + timeout
        while True:
            payload = f"{os.getpid()} {time.time()} {uuid.uuid4().hex}".encode()
            if self.meta_store.put_if_absent(LOCK_BASENAME, payload):
                break
            raw = self.meta_store.get(LOCK_BASENAME)
            if raw is not None:
                try:
                    held_since = float(raw.split()[1])
                except (IndexError, ValueError):
                    held_since = 0.0
                if time.time() - held_since > stale_after:
                    # Conditional on the observed stale payload: if a
                    # rival stole first and a fresh lock now sits at
                    # the key, this is a no-op and we loop to contend.
                    self.meta_store.delete_if_match(LOCK_BASENAME, raw)
                    continue
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"writer lock on {self.path} held for >{timeout}s; "
                    "remove it manually if the holder crashed"
                )
            time.sleep(poll)
        try:
            yield
        finally:
            # Release only OUR record: if we held past stale_after and
            # were stolen from, the key now holds someone else's lock.
            self.meta_store.delete_if_match(LOCK_BASENAME, payload)

    def reserve_seqs(
        self, spark: SparkSession, n_pset_slots: int, peek: bool = False
    ) -> tuple[int, int]:
        """Atomically claim the next ``_run_seq`` and an exclusive
        ``_pset_seq`` range ``[base+1, base+n_pset_slots]``.

        Returns ``(run_seq, pset_base)``.  The watermark lives in the
        committed metadata, so a reservation is visible to other
        writers BEFORE the run's data lands — this closes the
        lost-update race where two concurrent ``run()`` calls both read
        ``max_seqs`` and stamp identical seqs.  Watermarks only ever
        move forward (``max(parquet footer stats, meta watermark)``),
        so a run that reserves and then crashes leaves a harmless gap,
        never a collision.

        Reservation commits through LOCK-FREE manifest CAS
        (:meth:`update_meta`): of N racing writers one wins the
        conditional put of version N+1, the rest recompute against the
        winner's watermark and retry — correct on any store with
        conditional put, including S3-style object stores with no
        atomic rename or O_EXCL.

        ``peek=True`` (used by ``save=False`` runs, which never append)
        computes the same values without committing anything."""
        def _compute(meta: dict) -> tuple[int, int]:
            mr, mp = self.max_seqs(spark)
            run_seq = max(mr + 1, int(meta.get("next_run_seq", 0)))
            pset_base = max(mp, int(meta.get("next_pset_seq", 0)) - 1)
            return run_seq, pset_base

        if peek:
            return _compute(self.read_meta())

        reserved: dict[str, tuple[int, int]] = {}

        def mutate(meta: dict) -> dict:
            run_seq, pset_base = _compute(meta)
            reserved["v"] = (run_seq, pset_base)
            meta["next_run_seq"] = run_seq + 1
            meta["next_pset_seq"] = pset_base + int(n_pset_slots) + 1
            meta.setdefault("engine", "psweep_spark")
            meta.setdefault("created_utc", time.time())
            return meta

        self.update_meta(mutate)
        return reserved["v"]

    # -- read ----------------------------------------------------------------

    #: how long :meth:`load` waits out a concurrent :meth:`_rewrite`'s
    #: rename window before concluding the table is genuinely absent.
    #: The window itself is two ``os.rename`` calls (microseconds); the
    #: budget is generous so a reader never mistakes an in-flight
    #: rewrite for an empty DB (ADVICE r10 #1).
    rewrite_wait_s: float = 10.0

    def _exists_settling_rewrite(self) -> bool:
        """:meth:`exists`, retrying through a concurrent rewrite swap.

        :meth:`_rewrite` commits via ``rename(data → data.old)`` then
        ``rename(data.rewrite → data)`` — between the two renames
        ``data/`` is absent.  A plain existence check in that window
        reports "table empty", which a concurrent ``run()``'s skip-dups
        anti-join would silently believe (re-running every pset).  If
        ``data/`` is absent but either swap marker (``data.old`` /
        ``data.rewrite``) is present, a rewrite is in flight: wait it
        out briefly instead of returning False.  No markers and no data
        means the DB really is empty.
        """
        deadline = time.monotonic() + self.rewrite_wait_s
        while True:
            if self.exists():
                return True
            in_flight = os.path.isdir(self.data_path + ".old") or os.path.isdir(
                self.data_path + ".rewrite"
            )
            if not in_flight:
                # markers may have vanished in the instant AFTER our
                # exists() check and the rewrite completed — re-check
                # once so that interleaving still reads the new table
                return self.exists()
            if time.monotonic() >= deadline:
                return self.exists()
            time.sleep(0.05)

    def load(self, spark: SparkSession) -> DataFrame | None:
        """Full table with union-of-keys schema (mergeSchema read).

        Waits out a concurrent rewrite's rename window (see
        :meth:`_exists_settling_rewrite`) so readers racing a
        pset-schema-widening rewrite never observe a phantom-empty
        table."""
        if not self._exists_settling_rewrite():
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
        """Append one run's rows; widen + rehash history if pset cols grew.

        **Stage-then-commit** (concurrency-safe): the new rows are
        first written to a private staging directory — the expensive
        part (executing the run's ``mapInPandas`` plan) runs with NO
        lock held, so concurrent runs overlap their compute.  Commit
        then happens under :meth:`writer_lock` and is pure filesystem
        renames: each staged ``_run_id=…`` partition directory moves
        into the table (run ids are UUIDs, so directories never
        collide; part filenames carry the Spark task UUID, so even a
        shared directory merge is collision-free).  This also removes
        the classic concurrent-append hazard of two Spark jobs sharing
        one ``_temporary`` committer directory under the same output
        path.  The rare pset-schema-widening rewrite keeps the lock for
        its whole read→rehash→swap, since it replaces the table."""
        spark = new_df.sparkSession
        staging = f"{self.data_path}.staging-{uuid.uuid4().hex[:12]}"
        (
            new_df.write.mode("overwrite")
            .option("compression", "snappy")
            .partitionBy("_run_id")
            .parquet(staging)
        )
        try:
            with self.writer_lock():
                old_df = self.load(spark)
                if old_df is None:
                    os.rename(staging, self.data_path)

                    def _stamp(meta: dict) -> dict:
                        meta.setdefault("engine", "psweep_spark")
                        meta.setdefault("created_utc", time.time())
                        return meta

                    self.update_meta(_stamp)
                    return

                self._check_type_compat(old_df.schema, new_df.schema)
                old_pset = set(filter_cols(old_df.columns))
                new_pset = set(filter_cols(new_df.columns))

                if new_pset - old_pset:
                    # pset schema widened: NULL-extend history and
                    # recompute every _pset_hash over the union pset col
                    # set (reference psweep.py:1432-1437) — one-time
                    # table rewrite.  Re-read the STAGED files (schema
                    # pinned — no partition-value type re-inference)
                    # instead of re-executing the run plan.
                    staged_df = spark.read.schema(new_df.schema).parquet(
                        staging
                    )
                    widened = old_df
                    new_types = {
                        f.name: f.dataType for f in new_df.schema.fields
                    }
                    for c in sorted(new_pset - old_pset):
                        widened = widened.withColumn(
                            c, F.lit(None).cast(new_types[c])
                        )
                    all_df = widened.unionByName(
                        staged_df, allowMissingColumns=True
                    )
                    all_df = all_df.withColumn(
                        "_pset_hash", df_hash_expr(all_df.schema)
                    )
                    self._rewrite(all_df)
                else:
                    self._commit_staging(staging)
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def _commit_staging(self, staging: str) -> None:
        """Move staged partition directories into the table (renames)."""
        for name in os.listdir(staging):
            if not name.startswith("_run_id="):
                continue  # _SUCCESS marker etc.
            src = os.path.join(staging, name)
            dst = os.path.join(self.data_path, name)
            if not os.path.exists(dst):
                os.rename(src, dst)
            else:
                for f in os.listdir(src):
                    os.rename(os.path.join(src, f), os.path.join(dst, f))

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

    def vacuum(self, max_age_s: float = 24 * 3600.0) -> list[str]:
        """Remove leftover transaction debris older than ``max_age_s``:
        ``data.staging-*`` dirs from appends that crashed between the
        staged write and commit, and a ``data.old`` left by an
        interrupted rewrite swap.  Never touches live data — staged
        dirs are private to their (dead) writer, and ``data.old`` only
        survives when the rename to ``data`` already succeeded.
        Returns the removed paths."""
        removed: list[str] = []
        parent = os.path.dirname(self.data_path)
        base = os.path.basename(self.data_path)
        if not os.path.isdir(parent):
            return removed
        now = time.time()
        for name in os.listdir(parent):
            if name.startswith(base + ".staging-") or name == base + ".old":
                p = os.path.join(parent, name)
                try:
                    if now - os.path.getmtime(p) >= max_age_s:
                        shutil.rmtree(p, ignore_errors=True)
                        removed.append(p)
                except OSError:
                    continue
        return removed

    def rehash_from_reference(
        self,
        spark: SparkSession,
        pk_path: str,
        verify_joblib_hashes: bool = True,
    ) -> DataFrame:
        """One-shot import of a reference psweep ``database.pk``
        (pickled pandas DataFrame, psweep.py:36,1334-1336) into this
        Spark database, recomputing every ``_pset_hash`` canonically.

        The reference stamps joblib-SHA1 hashes; this engine stamps
        canonical sha256 — without rehashing, ``skip_dups`` against a
        migrated DB would recompute the entire history.  Each imported
        row's stored hash is first cross-checked against the
        bit-compatible reimplementation (``pset_hash(...,
        method="joblib-sha1")``), proving the pset columns survived the
        round-trip intact, then replaced with the canonical hash.

        Driver-side by design: a reference DB is a single-node pickle,
        bounded by the reference's own in-memory model — never 100 TB.
        Returns the imported rows as stamped."""
        import math

        import pandas as pd

        from .hashing import col_kind, pset_hash

        pdf = pd.read_pickle(pk_path)
        pset_cols = [c for c in pdf.columns if col_kind(c) == "pset"]

        def _clean(v):
            # the reference's dtype=object wash leaves numpy scalars
            # and pd.NA behind; normalize to plain python for both the
            # compat hash (type-sensitive!) and Spark inference.  The
            # reference's own examples (repeat_failed.py:58-61) insist
            # users store native types, so native is the round-trip.
            if v is None or v is pd.NA:
                return None
            if isinstance(v, float) and math.isnan(v):
                return v
            if hasattr(v, "item") and type(v).__module__ == "numpy":
                return v.item()
            return v

        rows = []
        mismatches = 0
        for rec in pdf.to_dict(orient="records"):
            rec = {k: _clean(v) for k, v in rec.items()}
            pset = {c: rec[c] for c in pset_cols}
            if verify_joblib_hashes and rec.get("_pset_hash") is not None:
                compat = pset_hash(pset, method="joblib-sha1")
                if compat != rec["_pset_hash"]:
                    mismatches += 1
            rec["_pset_hash"] = pset_hash(pset)
            rows.append(rec)
        if mismatches:
            raise ValueError(
                f"{mismatches}/{len(rows)} rows of {pk_path} have a stored "
                "_pset_hash that does not match the joblib-sha1 "
                "recomputation — pset values were altered after hashing "
                "(or hashed with non-native types); re-run with "
                "verify_joblib_hashes=False to import anyway"
            )
        imported = spark.createDataFrame(rows)
        self.append(imported)
        return imported

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

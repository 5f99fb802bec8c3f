"""Deterministic hash-based sampling — the reproducible alternative to
``DataFrame.sample``.

``sample()``/``sampleBy()`` draw from a per-partition RNG: the kept set
changes with partitioning, retries, and engine — unusable when a 100 TB
corpus is sampled incrementally (new files arrive, old decisions must
not flip) or when two systems must agree on the sample.  Hash sampling
fixes the decision per KEY: keep iff ``bucket(key) < rate·B`` where
``bucket = int(md5(key)[:15 hex]) mod B`` — stable under repartition,
re-runs, engine swaps (md5 is md5 everywhere), and growable (raising
the rate strictly grows the kept set, so a 1% sample is a subset of the
10% sample — nested samples for scaling-law curves for free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1_000_000


def _valid_weight(weight_col: str) -> Column:
    """Positive, non-NULL, non-NaN weight filter.  ``> 0`` alone is not
    enough: Spark orders NaN ABOVE every double, so ``NaN > 0`` is
    TRUE and a NaN weight would flow into the E-S key as ln(u)/NaN =
    NaN — which Spark's descending sort ranks first while pandas'
    ``sort_values`` ranks last, breaking the lossless pre-reduction
    guarantee and making output partition-dependent."""
    w = F.col(weight_col).cast("double")
    return (w > 0) & ~F.isnan(w)


def _reject_reserved(df: DataFrame, names: tuple[str, ...], op: str) -> None:
    """Raise when ``df`` already carries a column this operator emits or
    uses internally — ``withColumn`` would silently REPLACE the caller's
    column and corrupt the final ``select(*df.columns, ...)`` output."""
    clash = [c for c in names if c in df.columns]
    if clash:
        raise ValueError(
            f"{op}: input columns {clash} collide with reserved "
            f"output/internal column names {list(names)}; rename them first"
        )


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from md5 of the (salted) key string.
    15 hex chars = 60 bits — parses exactly into a long in any engine."""
    s = F.concat(F.lit(salt), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % BUCKETS


def sample_by_hash(
    df: DataFrame,
    key_col: str,
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Keep each row iff its key hashes below ``rate`` — deterministic,
    repartition-proof, nested across rates. ``salt`` derives
    independent samples from the same keys (e.g. train/holdout)."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(rate * BUCKETS))


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform in (0, 1] from md5 of the (salted) key.

    13 hex chars = 52 bits — below the double mantissa, so the integer
    parse AND the division are exact in IEEE754: any engine that can
    md5 and divide reproduces the identical double bit-for-bit."""
    s = F.concat(F.lit(salt), key.cast("string"))
    v = F.conv(F.substring(F.md5(s), 1, 13), 16, 10).cast("double")
    return (v + F.lit(1.0)) / F.lit(float(1 << 52))


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis 2006): each row gets key ``ln(u)/w`` with
    ``u = hash_uniform(key)``; the top-``k`` rows by that key are a
    weight-proportional sample (P(row i first) = w_i / Σw).

    Replacing the RNG with the md5-derived uniform makes the draw a
    pure function of (key, salt): stable under repartition, retries,
    and engine swaps — the property a 100 TB curriculum-sampling job
    needs so re-runs and audits agree on the chosen rows.

    Scale shape: one map-side expression + TakeOrdered top-k
    (per-partition heads, driver merge of k·partitions rows) — no
    global sort, no shuffle of the corpus.  ``ln`` is evaluated on
    identical doubles in any engine; two keys would need to collide
    within 1 ULP (~1e-16 relative) to make the order engine-dependent.

    Rows with weight ≤ 0, NULL or NaN are dropped before scoring:
    weight 0 with u == 1 yields ln(1)/0 = NaN — and NaN weights pass a
    bare ``> 0`` filter because Spark orders NaN above all doubles —
    either way a NaN key would win the descending top-k; negative
    weights invert the selection.  E-S is defined on positive weights
    only.  The internal scoring key never leaks: the returned schema
    is exactly ``df``'s.
    """
    _reject_reserved(df, ("__es_key",), "weighted_sample_topk")
    es = F.log(hash_uniform(F.col(key_col), salt)) / F.col(weight_col).cast(
        "double"
    )
    return (
        df.filter(_valid_weight(weight_col))
        .withColumn("__es_key", es)
        .orderBy(F.desc("__es_key"), F.asc(key_col))
        .limit(k)
        .select(*df.columns)
    )


def weighted_sample_topk_per_group(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    group_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-group weighted sampling without replacement:
    the top-``k`` rows per ``group_col`` by the Efraimidis–Spirakis key
    ``ln(u)/w`` — "sample k docs per language proportional to length"
    (the stratified curriculum/mixture primitive).

    Scale shape — the naive form is a window over the whole corpus
    partitioned by group (full-corpus shuffle).  Instead the corpus is
    PRE-REDUCED per input partition with a bounded fold: an Arrow
    ``mapInPandas`` pass keeps at most ``k`` rows per (group,
    partition) — memory O(k·groups + batch), zero shuffle — which is
    lossless because a row in the global per-group top-k is necessarily
    in its own partition's per-group top-k.  The exact window then runs
    over ≤ k·groups·partitions rows, never the corpus.

    Determinism: the E-S key is a pure function of (key, salt) — see
    :func:`weighted_sample_topk` — and both the fold and the window
    break ties by ``key_col`` ascending.  Rows with weight ≤ 0 / NULL /
    NaN are dropped — NaN matters doubly here: it passes a bare ``> 0``
    (Spark sorts NaN above all doubles) and the resulting NaN E-S key
    sorts FIRST in the Spark window but LAST in the pandas pre-reduce,
    so the bounded fold could drop the row the window would rank #1.

    Returns ``df``'s columns plus ``sample_rank`` (1-based within
    group).
    """
    from collections.abc import Iterator

    import pandas as pd

    from ..plans import ensure_parallelism

    _reject_reserved(
        df, ("__es_key", "sample_rank"), "weighted_sample_topk_per_group"
    )
    es = F.log(hash_uniform(F.col(key_col), salt)) / F.col(weight_col).cast(
        "double"
    )
    scored = (
        df.filter(_valid_weight(weight_col))
        .withColumn("__es_key", es)
        .select(*df.columns, "__es_key")
    )
    cols = list(scored.columns)
    schema = scored.schema

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat((acc, pdf))
            acc = (
                acc.sort_values(
                    ["__es_key", key_col], ascending=[False, True]
                )
                # dropna=False: a NULL group is a group (matches the
                # window semantics downstream) — pandas would silently
                # drop those rows otherwise
                .groupby(group_col, sort=False, dropna=False)
                .head(k)
            )
        if acc is not None:
            yield acc[cols]

    from pyspark.sql.window import Window

    reduced = ensure_parallelism(scored).mapInPandas(fold, schema=schema)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("__es_key"), F.asc(key_col)
    )
    return (
        reduced.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
        .select(*df.columns, "sample_rank")
    )


def global_shuffle_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic global training shuffle: assign every row a
    ``shard`` in [0, n_shards) and a pseudo-random ``pos`` within its
    shard — the final step of a training-data pipeline (examples must
    reach the trainer in an order uncorrelated with their source
    layout, yet REPRODUCIBLY, so a re-run or a resumed job reads the
    identical stream).

    Both coordinates derive from the md5 bucket of the (salted) key:
    ``shard = bucket mod n_shards`` and the within-shard order sorts by
    the bucket value itself (key ascending breaks the rare bucket
    ties).  ``DataFrame.orderBy(rand())`` can guarantee none of this —
    the RNG draw changes with partitioning and retries.

    Scale shape: ONE shuffle — the window's hash partitioning on
    ``shard`` is exactly the ``repartition(shard)`` a sharded-file
    writer needs, and the per-shard sort is in-partition (no global
    order).  At the sink this plan becomes
    ``.write.partitionBy("shard")`` with files already ordered.

    Returns ``df``'s columns plus ``shard`` (int) and ``pos``
    (1-based long within shard).
    """
    from pyspark.sql.window import Window

    _reject_reserved(df, ("shard", "pos", "__b"), "global_shuffle_assign")
    b = hash_bucket(F.col(key_col), salt)
    out = df.withColumn("__b", b).withColumn(
        "shard", (F.col("__b") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.asc("__b"), F.asc(key_col))
    return (
        out.withColumn("pos", F.row_number().over(w).cast("long"))
        .select(*df.columns, "shard", "pos")
    )


def stratified_sample_by_hash(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. upsample rare languages,
    downsample crawl dumps). One map-side filter, zero shuffle."""
    b = hash_bucket(F.col(key_col), salt)
    thresh = None
    for k, r in rates.items():
        cond = F.when(F.col(strata_col) == k, F.lit(int(r * BUCKETS)))
        thresh = cond if thresh is None else thresh.when(
            F.col(strata_col) == k, F.lit(int(r * BUCKETS))
        )
    thresh = (
        F.lit(int(default_rate * BUCKETS))
        if thresh is None
        else thresh.otherwise(F.lit(int(default_rate * BUCKETS)))
    )
    return df.filter(b < thresh)

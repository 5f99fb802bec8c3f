"""Multi-dimensional clustering (Z-order) for data-skipping layout.

Parquet/ORC readers prune row groups and files by min/max statistics.
A table sorted by ONE column skips beautifully on that column and not
at all on others; Z-ordering interleaves the bits of several columns'
rank-buckets so that files are simultaneously "narrow" in every
clustered dimension — the same layout trick Delta's OPTIMIZE ZORDER BY
and Iceberg's sort orders use (public technique: Morton codes).

At 100 TB this is THE difference between scanning 3 files and 3000 for
a ``user_id = X AND ts BETWEEN ..`` query that partition pruning alone
can't serve.

Bucketing strategy (VERDICT r01 #7): per-dimension equi-depth buckets
come from **approxQuantile boundaries** (distributed Greenwald-Khanna
sketch; the driver pulls only ``buckets-1`` doubles per dim), and each
row's bucket is an **unrolled binary search against the broadcast
boundary literals** — a pure map-side projection in whole-stage
codegen.  The previous ``ntile().over(Window.orderBy(col))`` pair was
two *global single-partition sorts*: at 100 TB the ingest-time OPTIMIZE
would serialize on one task.  Rank semantics are retained (equi-depth,
skew-proof) at sketch accuracy, which is exactly what file-level
clustering needs — bucket boundaries only have to be *consistent*, not
exact ranks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZBITS = 16  # 16 bits/dim × 2 dims = 32-bit Morton code
DEFAULT_BUCKETS = 1024  # 2^10 per dim; must stay ≤ 2^ZBITS


def _interleave2(a: Column, b: Column) -> Column:
    """Morton code: bit-interleave two 16-bit non-negative ints —
    a's bit i lands at 2i, b's at 2i+1.  Pure shifts/masks, stays in
    whole-stage codegen."""
    z = F.lit(0).cast("long")
    for i in range(ZBITS):
        z = (
            z.bitwiseOR(
                F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            ).bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return z


def _numeric_surrogate(c: Column, dt: T.DataType) -> Column:
    """Column → double surrogate that preserves order for range-typed
    dims (numeric/timestamp/date) and equality for everything else
    (hash spread: point-lookup pruning still works; string *range*
    scans don't prune — document at call sites)."""
    if isinstance(
        dt,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    ):
        return c.cast("double")
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(c).cast("double")
    if isinstance(dt, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    if isinstance(dt, T.BooleanType):
        return c.cast("int").cast("double")
    return F.xxhash64(c).cast("double")


def _bucket_expr(v: Column, bounds: list[float]) -> Column:
    """#boundaries ≤ v over the literal boundary array, as ONE
    ``size(filter(...))`` lambda — a single small expression node
    (an unrolled binary search nests the accumulator twice per step →
    exponential expression-tree growth), evaluated map-side in codegen,
    no shuffle, no window.  NULL → bucket 0 (sorts first, matching the
    old ntile nulls-first placement)."""
    m = len(bounds)
    if m == 0:
        return F.lit(0).cast("long")
    arr = F.lit(bounds)
    cnt = F.size(F.filter(arr, lambda x: x <= v))
    return F.when(v.isNull(), F.lit(0)).otherwise(cnt).cast("long")


def zorder_value(
    df: DataFrame,
    cols: list[str],
    buckets: int = DEFAULT_BUCKETS,
    relative_error: float = 1e-3,
) -> DataFrame:
    """Append ``_zvalue``: the Morton interleave of each column's
    equi-depth quantile bucket.  Rank-based, so skewed or
    arbitrary-typed columns still spread across the code space.
    Currently 2 columns (the overwhelmingly common case; more dims =
    more interleave terms, same construction).

    Cost model: ONE distributed approxQuantile pass (both dims in the
    same job) + a map-side bucket projection.  No global sort anywhere;
    the ingest-time clustering cost is a scan, paid once per OPTIMIZE,
    amortized over every subsequent pruned read."""
    if len(cols) != 2:
        raise ValueError("zorder_value currently supports exactly 2 columns")
    if buckets > (1 << ZBITS):
        raise ValueError(f"buckets must be <= 2^{ZBITS}")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    surr = [
        _numeric_surrogate(F.col(c), by_name[c]).alias(f"__zs_{i}")
        for i, c in enumerate(cols)
    ]
    probs = [i / buckets for i in range(1, buckets)]
    # one job, both dims; driver receives 2·(buckets-1) doubles
    bounds = df.select(*surr).approxQuantile(
        [f"__zs_{i}" for i in range(len(cols))], probs, relative_error
    )
    buck = [
        _bucket_expr(s, sorted(set(b)))
        for s, b in zip(
            [_numeric_surrogate(F.col(c), by_name[c]) for c in cols], bounds
        )
    ]
    return df.withColumn("_zvalue", _interleave2(buck[0], buck[1]))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Z-curve over ``cols``: range-
    partition on the Morton code (each output file owns a contiguous
    code range = a small hyper-rectangle of the clustered dims), sort
    within partitions, drop the helper column.  Readers prune files by
    min/max stats on BOTH columns.  (repartitionByRange samples its
    range boundaries — a parallel exchange, never a single-partition
    sort.)"""
    z = zorder_value(df, cols)
    (
        z.repartitionByRange(num_files, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode(mode)
        .parquet(path)
    )

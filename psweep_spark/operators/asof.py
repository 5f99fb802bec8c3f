"""As-of (time-travel) join — an operator Spark's DataFrame API lacks.

psweep has no joins at all (reference `src/psweep/psweep.py` delegates
post-processing to pandas, `doc/source/written/manual.md:820-823` —
where the pandas answer would be ``pd.merge_asof``); this supplies the
distributed equivalent for the events/time-series surface.

Semantics match ``pd.merge_asof`` / DuckDB ``ASOF JOIN``: for every
left row, pick the single right row with the largest right timestamp
``<=`` the left timestamp (direction="backward"; ``>=`` for
"forward"), optionally within the same ``by`` key and a ``tolerance``.

Implementation is a **union + window composition**, not a join:

* tag both sides, union them (schema-aligned; right's carried columns
  ride in one struct, null on left rows);
* one window per ``by`` key ordered by (ts, side) — right rows sort
  before left rows at equal ts, so exact matches are visible;
* ``last(struct, ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT
  carries the latest right row onto each left row.

Scale: exactly ONE shuffle (hash-partition by ``by``), no range
explosion, no per-key driver loop; skewed keys fall to AQE.  Compare a
naive ``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + max-window: that
join fans out |L_k|·|R_k| rows per key before reducing — quadratic on
hot keys, fatal at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the carried columns of the
    nearest preceding (or following) ``right`` row.

    Parameters
    ----------
    on: timestamp column present on both sides.
    by: equi-key column(s) to match within (e.g. ``user_id``).
    right_cols: columns carried from ``right`` (default: all except
        ``on``/``by``); they appear with ``suffix`` appended, plus
        ``<on><suffix>`` for the matched timestamp itself.
    direction: "backward" (right.ts <= left.ts, the default) or
        "forward" (right.ts >= left.ts).
    tolerance_us: optional max distance in microseconds — matches
        farther than this yield nulls (pd.merge_asof ``tolerance``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by_cols]

    carried = F.struct(
        F.col(on).alias(f"__{on}"), *[F.col(c).alias(c) for c in right_cols]
    )
    # side orders right before left at equal ts for backward (exact
    # matches visible), after for forward (window is reversed there)
    r_tagged = right.select(
        *by_cols, F.col(on), F.lit(0).alias("__side"), carried.alias("__carry")
    )
    l_tagged = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__carry"].dataType).alias("__carry"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col(on).asc(), F.col("__side").asc()]
    else:
        order = [F.col(on).desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__m", F.last("__carry", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    m_ts = F.col(f"__m.__{on}")
    if tolerance_us is not None:
        dist = F.abs(
            F.unix_micros(F.col(on)) - F.unix_micros(m_ts)
        )
        matched = matched.withColumn(
            "__m",
            F.when(dist <= F.lit(int(tolerance_us)), F.col("__m")),
        )

    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col(f"__m.__{on}").alias(f"{on}{suffix}"))
    out_cols += [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return matched.select(*out_cols)

"""Range (interval) join — point-in-interval matching at scale.

Spark plans ``l JOIN r ON p BETWEEN s AND e`` with no equi-key as a
BroadcastNestedLoopJoin — O(|L|·|R|) row comparisons, unusable at
100 TB.  The scalable form is a **bucketed equi-join**: quantize time
into fixed buckets, replicate each interval into every bucket it
overlaps, tag each point with its single bucket, equi-join on
(keys…, bucket), then apply the exact BETWEEN as a post-filter.  Each
(point, interval) pair meets in exactly one bucket (the point's), so
no dedup pass is needed.  Cost: one shuffle on (keys, bucket);
replication factor = avg interval length / bucket width — pick
``bucket_width_us`` near the median interval length to keep it O(1).

The reference has no join surface at all (post-processing is "your
full pandas Ninja skills", `doc/source/written/manual.md:820-823`);
this is part of the beyond-reference events/time-series surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_bucketed"]


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: str | list[str] | None = None,
    bucket_width_us: int = 600_000_000,
) -> DataFrame:
    """Inner-join every point row to the interval rows containing it.

    ``points``/``intervals`` must not share column names other than the
    ``by`` keys.  Timestamps are compared at microsecond precision;
    bounds are inclusive on both ends (SQL BETWEEN).
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    w = int(bucket_width_us)

    p_us = F.unix_micros(F.col(point_col))
    s_us = F.unix_micros(F.col(start_col))
    e_us = F.unix_micros(F.col(end_col))

    p = points.withColumn("__bucket", F.floor(p_us / w))
    i = intervals.withColumn(
        "__bucket", F.explode(F.sequence(F.floor(s_us / w), F.floor(e_us / w)))
    )
    cond = [F.col(f"p.{c}") == F.col(f"i.{c}") for c in by_cols]
    cond.append(F.col("p.__bucket") == F.col("i.__bucket"))
    joined = p.alias("p").join(i.alias("i"), cond, "inner").filter(
        F.col(f"p.{point_col}").between(
            F.col(f"i.{start_col}"), F.col(f"i.{end_col}")
        )
    )
    keep = [F.col(f"p.{c}") for c in points.columns] + [
        F.col(f"i.{c}") for c in intervals.columns if c not in by_cols
    ]
    return joined.select(*keep)

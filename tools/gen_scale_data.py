"""Generate larger scale factors by deterministic tiling of the driver's
sf0.1 tables (VERDICT r3 item 6: scale-curve evidence needs an sf1).

The driver's testdata is read-only and its generator is not in-repo, so
sf1 is derived: every fact table is tiled ``mult`` times with key
offsets that keep foreign keys consistent (replica i of an order still
joins replica i of its customer), and content columns are perturbed so
replicas are genuinely NEW data, not duplicates:

* documents: every token gets a per-replica suffix — token/char stats
  survive, but replicas share no shingles with the originals (tiling
  without this would hand the dedup queries a corpus that is 90%
  near-duplicates — a different workload, not a bigger one).
* embeddings: replica vectors are rotations of the original (norm
  preserved, direction new).
* events: replicas keep the original time window (more traffic in the
  same window — how a busier system actually scales) with offset
  event/user ids.

Dimension tables (region, nation) stay fixed, TPC-H style.

Usage: python tools/gen_scale_data.py [mult] [src_dir] [dst_dir] [tables]
Defaults: 10 /root/testdata/sf0.1 /root/repo/scale_data/sf1 (all tables);
the optional 4th arg is a comma-separated table subset.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from psweep_spark.session import get_spark  # noqa: E402

KEY_OFFSETS = {
    # column -> base offset unit (replica i adds i * unit); units are
    # far above the sf0.1 key ranges so replicas never collide
    "c_custkey": 1_000_000,
    "o_orderkey": 10_000_000,
    "o_custkey": 1_000_000,
    "l_orderkey": 10_000_000,
    "l_partkey": 1_000_000,
    "l_suppkey": 100_000,
    "s_suppkey": 100_000,
    "p_partkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

COPY_AS_IS = {"region", "nation"}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def tile(spark, src: str, dst: str, mult: int,
         tables: list[str] | None = None) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in tables or TABLES:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        out_path = os.path.join(dst, f"{t}.parquet")
        if t in COPY_AS_IS:
            out = df
        else:
            if mult >= 100:
                # a 10-MB source parquet reads as ~1-4 splits; at
                # mult=1000 the crossJoin inherits that, leaving 28+
                # cores idle while 4 tasks each expand and write 150M
                # rows.  Spread the SOURCE (cheap — megabytes) so the
                # expansion itself is parallel; row content is
                # partition-invariant.
                df = df.repartition(32)
            rep = df.crossJoin(
                spark.range(mult).select(F.col("id").cast("int").alias("__r"))
            )
            cols = []
            for c, dt in df.dtypes:
                col = F.col(c)
                if dt == "timestamp_ntz":
                    # the source tables carry tz-aware TIMESTAMP; a
                    # round-trip through Spark must not downgrade to
                    # NTZ (streaming watermarks require LTZ)
                    col = col.cast("timestamp")
                    dt = "timestamp"
                if c in KEY_OFFSETS:
                    col = (col + F.col("__r").cast("bigint")
                           * F.lit(KEY_OFFSETS[c])).cast(dt)
                elif t == "documents" and c == "text":
                    # per-replica token suffix: replica 0 is verbatim
                    col = F.when(F.col("__r") == 0, col).otherwise(
                        F.concat_ws(
                            " ",
                            F.transform(
                                F.split(F.trim(col), r"\s+"),
                                lambda x: F.concat(
                                    x, F.lit("r"),
                                    F.col("__r").cast("string"),
                                ),
                            ),
                        )
                    )
                elif t == "documents" and c == "n_chars":
                    # recomputed below after the text perturbation
                    col = F.col("__nc")
                elif t == "embeddings" and c == "embedding":
                    # rotate by replica index: norm-preserving, new
                    # direction; replica 0 verbatim
                    n = F.size(col)
                    col = F.when(F.col("__r") == 0, col).otherwise(
                        F.concat(
                            F.slice(col, (F.col("__r") % n) + 1,
                                    n - (F.col("__r") % n)),
                            F.slice(col, F.lit(1), F.col("__r") % n),
                        )
                    )
                    # mult beyond the embedding dim (64) would repeat
                    # rotations — replica 64 has replica 0's direction.
                    # Replicas >= 100 (i.e. only the sf100 tier; sf1 and
                    # sf10 stay bit-identical to the r4-r9 artifacts) get
                    # a deterministic per-replica Rademacher sign flip on
                    # top of the rotation: norm still exact, direction
                    # distinct per replica with overwhelming probability.
                    col = F.when(F.col("__r") < 100, col).otherwise(
                        F.zip_with(
                            col,
                            F.sequence(F.lit(0), n - 1),
                            lambda x, j: x * F.when(
                                F.pmod(
                                    F.hash(F.col("__r"), j), F.lit(2)
                                ) == 0,
                                F.lit(1.0),
                            ).otherwise(F.lit(-1.0)),
                        )
                    )
                cols.append(col.alias(c))
            out = rep
            if t == "documents":
                txt = F.when(
                    F.col("__r") == 0, F.col("text")
                ).otherwise(
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.trim(F.col("text")), r"\s+"),
                            lambda x: F.concat(
                                x, F.lit("r"), F.col("__r").cast("string")
                            ),
                        ),
                    )
                )
                out = out.withColumn("__nc", F.length(txt).cast("bigint"))
            out = out.select(*cols)
        out.coalesce(max(1, mult // 2)).write.mode("overwrite").parquet(
            out_path
        )
        # count from the WRITTEN files — re-running `out` would execute
        # the whole expansion a second time (2x generation cost at
        # mult=1000)
        n_rows = spark.read.parquet(out_path).count()
        print(f"{t}: {n_rows} rows -> {out_path}", flush=True)


if __name__ == "__main__":
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[3] if len(sys.argv) > 3
        else os.path.join(REPO, "scale_data", "sf1")
    )
    # optional 4th arg: comma-separated table subset, e.g. "documents"
    # (the fourth-decade sketch legs only need documents — tiling 600M
    # lineitem rows for them would be pure waste)
    tables = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    spark = get_spark(app_name="gen-scale-data", shuffle_partitions=32)
    tile(spark, src, dst, mult, tables)

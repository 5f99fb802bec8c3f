"""Fourth-decade documents tile (VERDICT r10 "next round" #5): tile
``scale_data/sf100/documents.parquet`` ×10 into
``scale_data/sf1000_docs/documents.parquet`` (50M docs) so the
state-bounded sketch family (CMS / KMV / Misra-Gries heavy hitters)
can be measured across a FOURTH decade — documents only; no other
table is needed by those three queries, and a full sf1000 corpus
(6B lineitem rows) would buy nothing for them.

Key discipline mirrors tools/gen_scale_data.py: replica doc_ids are
offset by 100,000,000 per replica — strictly above sf100's max doc_id
(99×1,000,000 + 4,999), so replicas never collide.  Text is tiled
as-is: the sketch queries aggregate token/doc distributions, and an
exact ×10 replication multiplies every true frequency by exactly 10 —
which is precisely the property a "shuffle stays flat at any scale"
claim should be measured under (sketch state depends on DISTINCT
structure, not mass).

Usage: python tools/gen_sf1000_docs.py [src_docs_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from psweep_spark.session import get_spark  # noqa: E402

MULT = 10
OFFSET = 100_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "scale_data", "sf100"
    )
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "scale_data", "sf1000_docs"
    )
    spark = get_spark("gen-sf1000-docs", shuffle_partitions=32)
    docs = (
        spark.read.parquet(os.path.join(src, "documents.parquet"))
        # spread the source so the expansion parallelizes across cores
        .repartition(64)
    )
    reps = spark.range(MULT).select(F.col("id").cast("long").alias("__r"))
    out = (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("__r") * OFFSET)
        .drop("__r")
    )
    out.write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )
    n = spark.read.parquet(os.path.join(dst, "documents.parquet")).count()
    print(f"wrote {dst}/documents.parquet rows={n}")


if __name__ == "__main__":
    main()

"""Skewed-variant generator for the skew stress bench (VERDICT r5
item 7): the scale benches all run on the near-uniform synthetic
corpus, but a 100 TB reality is Zipfian — hot join keys and hot
shingles.  This tool derives a deliberately skewed variant of the sf1
scale tables so tools/bench_skew.py can measure the guarded paths
(explicit salting, the minhash hot-bucket cap, the shingle df cap, MG
eviction) actually engaging.

Skew injected (deterministic, hash-derived — regenerations identical):

* ``lineitem``: ~20% of rows have their ``l_orderkey`` rewritten to ONE
  hot key (an existing 'F'-status order, so the join filter keeps it).
  An unsalted shuffle join then lands ~1.2M rows in a single reducer.
* ``documents``: ~20% of docs get a shared 24-token boilerplate
  sentence appended — those docs share every boilerplate shingle (hot
  LSH band buckets, shingle df ≈ 10k at sf1) and make the corpus'
  bigram distribution genuinely Zipfian (one bigram family at ~20%
  mass) so Misra-Gries eviction runs under a satisfied guarantee.

Usage: python tools/gen_skew_data.py [src_sf_dir] [out_dir]
Defaults: scale_data/sf1 -> scale_data/skew_sf1 (orders copied as-is).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from psweep_spark.session import get_spark  # noqa: E402

BOILER = (
    "subscribe to our newsletter for updates terms of service apply "
    "copyright all rights reserved contact us for more information today"
)  # 20 tokens of plausible boilerplate — the classic hot-shingle source


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "scale_data", "sf1"
    )
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "scale_data", "skew_sf1"
    )
    spark = get_spark("gen-skew-data")

    orders = spark.read.parquet(os.path.join(src, "orders.parquet"))
    li = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
    hot = (
        orders.filter(F.col("o_orderstatus") == "F")
        .agg(F.min("o_orderkey"))
        .first()[0]
    )
    # ~20% of lineitem rows onto the hot key; the selector hashes the
    # full original key + line number so it's deterministic and
    # independent of the key distribution itself
    li_skew = li.withColumn(
        "l_orderkey",
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(5)) == 0,
            F.lit(hot).cast("long"),
        ).otherwise(F.col("l_orderkey")),
    )
    li_skew.write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))
    orders.write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))

    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    docs_skew = docs.withColumn(
        "text",
        F.when(
            F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 0,
            F.concat(F.col("text"), F.lit(" " + BOILER)),
        ).otherwise(F.col("text")),
    )
    docs_skew.write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    # the remaining tables are UNSKEWED — copy them through so the skew
    # dir is a complete 10-table sf_dir and the full correctness gate
    # (tools/check_correctness.py, r6 verdict item 6) can run on it
    import shutil

    def _mtime(p: str) -> float:
        if os.path.isdir(p):
            return max(
                (os.path.getmtime(os.path.join(r, f))
                 for r, _, fs in os.walk(p) for f in fs),
                default=os.path.getmtime(p),
            )
        return os.path.getmtime(p)

    for t in ("region", "nation", "customer", "supplier", "part",
              "events", "embeddings"):
        s = os.path.join(src, f"{t}.parquet")
        d = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(s):
            continue
        # refresh stale copies: a bare exists() guard kept OLD table
        # copies after the source sf_dir was regenerated, so the full
        # correctness gate validated against mismatched data (ADVICE
        # r7 #4) — copy unless the destination is at least as new
        if os.path.exists(d):
            if _mtime(d) >= _mtime(s):
                continue
            (shutil.rmtree if os.path.isdir(d) else os.remove)(d)
        (shutil.copytree if os.path.isdir(s) else shutil.copyfile)(s, d)

    n_li = li_skew.filter(F.col("l_orderkey") == hot).count()
    n_docs = docs_skew.filter(F.col("text").contains("newsletter")).count()
    print(
        f"wrote {out}: hot_orderkey={hot} rows={n_li} "
        f"({n_li / li.count():.1%} of lineitem); "
        f"boilerplate docs={n_docs} ({n_docs / docs.count():.1%})"
    )


if __name__ == "__main__":
    main()

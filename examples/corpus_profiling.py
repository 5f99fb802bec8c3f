"""Corpus profiling and reproducible sampling with bounded memory:
heavy hitters (Misra-Gries) → point-frequency checks (Count-Min) →
per-group statistics fits (mergeable OLS) → per-language weighted
sample → deterministic training shuffle.

Every stage is bounded-memory/bounded-shuffle by design — O(k)
counters, depth·width cells, six longs per group, k rows per group per
partition — so the identical program profiles a 100 TB corpus.  Each
operator is individually oracle-checked in the catalog
(corpus_heavy_hitters, corpus_cms_freq, docs_ols_scaling_fit,
docs_stratified_weighted_sample, docs_global_shuffle_shards); this
example shows them composed the way a data-curation user would.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def main() -> int:
    import psweep_spark as ps
    from psweep_spark.operators.sampling import (
        global_shuffle_assign,
        weighted_sample_topk_per_group,
    )
    from psweep_spark.operators.sketch import (
        cms_cells,
        cms_estimate,
        heavy_hitters_topk,
    )
    from psweep_spark.operators.stats import ols_fit
    from pyspark.sql import functions as F

    spark = ps.get_spark("example-corpus-profiling")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    toks = docs.filter(F.trim("text") != "").select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )

    # 1. What are the most frequent tokens?  O(k) memory per partition,
    #    zero-shuffle candidates, exact broadcast recount.
    top = heavy_hitters_topk(toks, "token", k_counters=4096, topk=10)
    print("top tokens:")
    for r in top.collect():
        print(f"  {r['rank']:>2}. {r['token']!r} × {r['cnt']}")

    # 2. How frequent are THESE tokens?  A Count-Min sketch answers
    #    point queries at fixed 4×1024 cells and merges across
    #    increments cell-wise.
    cells = cms_cells(toks, "token", depth=4, width=1024, salt="prof")
    probes = spark.createDataFrame(
        [("the",), ("und",), ("les",)], "token string"
    )
    for r in cms_estimate(cells, probes, "token", 4, 1024, "prof").collect():
        print(f"cms  {r['token']!r} ≈ {r['est_cnt']}")

    # 3. Per-language chars-per-token fit from mergeable sufficient
    #    statistics — one shuffle of six longs per language.
    d = docs.filter(F.trim("text") != "").select(
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    )
    for r in ols_fit(d, "x", "y", ["lang"]).orderBy("lang").collect():
        print(
            f"ols  {r['lang']}: chars ≈ {r['slope']:.2f}·tokens "
            f"+ {r['intercept']:.1f}  (R²={r['r2']:.3f}, n={r['n']})"
        )

    # 4. Reproducible curriculum sample: 5 docs per language, drawn
    #    proportional to length — the kept set survives repartitioning,
    #    retries, and engine swaps.
    sample = weighted_sample_topk_per_group(
        docs.select("lang", "doc_id",
                    F.col("n_chars").cast("double").alias("w")),
        key_col="doc_id", weight_col="w", group_col="lang", k=5,
        salt="prof",
    )
    n_sample = sample.count()

    # 5. Deterministic global shuffle: shard + position for the trainer.
    shards = global_shuffle_assign(
        sample.select("doc_id"), "doc_id", n_shards=4, salt="prof"
    )
    per_shard = dict(
        (r["shard"], r["n"])
        for r in shards.groupBy("shard").agg(F.count("*").alias("n")).collect()
    )
    print(f"sampled {n_sample} docs -> shards {per_shard}")

    # 6. How much vocabulary do the language shards share?  Bottom-k
    #    (KMV) sketches from one corpus pass; every pairwise estimate
    #    runs on the sketch relation, never a corpus join.
    from psweep_spark.operators.sketch import (
        kmv_overlap_matrix,
        kmv_sketch_per_group,
    )

    sk = kmv_sketch_per_group(toks, "token", "lang", k=256, salt="prof")
    for r in (
        kmv_overlap_matrix(sk, "lang", k=256)
        .orderBy("g_a", "g_b").limit(4).collect()
    ):
        print(
            f"kmv  {r['g_a']}~{r['g_b']}: J≈{r['est_jaccard']:.3f} "
            f"|∪|≈{r['est_union']:.0f}"
        )

    # 7. Daily-rollup shape: fold the per-shard sketches into ONE
    #    corpus sketch (kmv_merge is exact — bit-identical to a
    #    from-scratch pass; history never rescanned).
    from psweep_spark.operators.sketch import kmv_distinct_estimate, kmv_merge

    shard_sketches = [
        sk.filter(F.col("lang") == r["lang"]).select("hv")
        for r in sk.select("lang").distinct().collect()
    ]
    rolled = shard_sketches[0]
    for nxt in shard_sketches[1:]:
        rolled = kmv_merge(rolled, nxt, k=256)
    est = kmv_distinct_estimate(rolled, 256).collect()[0]
    print(f"kmv rollup: corpus distinct≈{est['est_distinct']:.0f} "
          f"(exact={est['is_exact']})")

    assert n_sample > 0 and sum(per_shard.values()) == n_sample
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

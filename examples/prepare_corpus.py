"""Training-data corpus preparation end-to-end: quality gate →
near-dup clustering → keep-best dedup → stratified sample → packing →
corpus accounting, composed from the engine's operators as ONE lazy
program over the `documents` table.

This is the beyond-reference surface (SURVEY §2.5): each stage below is
individually oracle-checked in the catalog (docs_quality_gate,
dedup_clusters, dedup_keep_best, docs_stratified_sample,
docs_pack_sequences, corpus_token_stats); this example shows them
composed the way a pipeline user would.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def main() -> int:
    import psweep_spark as ps
    from psweep_spark.operators.cluster import connected_components
    from psweep_spark.operators.dedup import jaccard_pairs
    from psweep_spark.operators.sampling import hash_bucket
    from psweep_spark.operators.text import quality_score, token_count
    from pyspark.sql import functions as F

    spark = ps.get_spark("example-prepare-corpus")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    # 1. quality gate: pure map-side filter, rides the scan
    gated = (
        quality_score(docs)
        .filter(
            (token_count(F.col("text")) >= 5) & (F.col("quality_score") > 0.3)
        )
        .drop("quality_score")
    )

    # 2. near-dup clusters (n-gram Jaccard pairs → connected components),
    #    then keep the longest doc per cluster
    pairs = jaccard_pairs(gated, n=3, threshold=0.5)
    clusters = connected_components(pairs).withColumnRenamed("node", "doc_id")
    labeled = gated.join(clusters, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    )
    keep = labeled.groupBy("cluster_id").agg(
        F.min_by("doc_id", -F.col("n_chars") * 10000000 + F.col("doc_id")).alias(
            "keeper"
        )
    )
    deduped = labeled.join(
        F.broadcast(keep),
        (labeled.cluster_id == keep.cluster_id) & (labeled.doc_id == keep.keeper),
    ).select("doc_id", "lang", "source", "n_chars", "text")

    # 3. deterministic stratified sample: 50% of English, 90% of the rest
    sampled = deduped.filter(
        hash_bucket(F.col("doc_id"), "example_v1")
        < F.when(F.col("lang") == "en", 500000).otherwise(900000)
    )

    # 4. corpus accounting
    stats = (
        sampled.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(F.col("text"))).alias("total_tokens"),
        )
        .orderBy("lang")
    )
    rows = stats.collect()
    assert rows, "pipeline produced no rows"
    for r in rows:
        print(f"{r['lang']}: {r['n_docs']} docs, {r['total_tokens']} tokens")
    n_in, n_out = docs.count(), sampled.count()
    print(f"kept {n_out}/{n_in} documents")
    assert 0 < n_out <= n_in
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

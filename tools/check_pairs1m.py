"""Exercise the >1M-pair DISTRIBUTED landing branch on real data
(VERDICT r10 "next round" #4).

At every gated SF so far the verified near-dup pair relation stayed
under ``materialized_for_reuse``'s 1M-row driver threshold (sf100:
254,550 pairs), so the ``localCheckpoint`` landing branch and
``connected_components``' star-contraction had only ever run under a
FORCED contract test (threshold=0), never on a corpus whose pair count
genuinely exceeds the dial.  This tool builds such a corpus, runs the
two threshold-steered catalog queries end-to-end at their DEFAULT
thresholds, proves the distributed branch was taken, and validates the
results against an independent construction oracle.

Corpus construction (deterministic, hash-derived):

* ``N_FAMILIES`` near-dup families of ``FAMILY_SIZE`` members each.
  Every member is a 60-token synthetic document (tokens ``w<h>`` drawn
  by ``xxhash64(family, pos)`` from a 5000-token vocabulary) with ONE
  member-unique token substituted at position ``member`` — pairwise
  3-gram Jaccard within a family ≈ 0.8-0.9 (≥ the τ=0.5 the queries
  verify at), across families ≈ 0.  Verified pairs therefore number
  ~``N_FAMILIES × C(FAMILY_SIZE, 2)`` — quadratic in family size, so
  1.3M pairs cost only 90k docs.
* the full sf1 documents table (50k real docs) is unioned in as
  organic mass so banding runs over realistic text too.

Construction oracle (independent of the engine's pair/cluster code):
family membership IS the expected clustering — every family must come
back as exactly one cluster containing exactly its members (cluster_id
= min member id by the CC contract), no family doc may co-cluster with
an organic doc, and the leakage-safe split must place every family
atomically (leaked_pairs == 0) while the naive per-doc split provably
leaks.  LSH pair-miss probability at J≈0.85 with 4 bands × 3 rows is
~2%/pair; family connectivity needs any spanning subset of its ~435
pairs, so a family splitting into two clusters has probability ~1e-8
— a failed parity check means an engine defect, not sampling noise.

Branch evidence recorded in the artifact:

* pair count > 1,000,000 (the default dial);
* ``leakage_split_pairs:ckpt`` registered (only the above-threshold
  branch of ``materialized_for_reuse`` registers the checkpoint tag);
* neither query's executed plan contains a ``LocalTableScan`` of the
  pair relation (the ≤1M branch would land pairs driver-side).

Writes CORRECTNESS_PAIRS1M_r11.json.  Usage:
    python tools/check_pairs1m.py [--keep-data]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from psweep_spark.session import get_spark  # noqa: E402

N_FAMILIES = 3_000
FAMILY_SIZE = 30
N_TOKENS = 60
VOCAB = 5_000
FAMILY_ID_BASE = 10_000_000  # far above organic doc_ids
DATA_DIR = os.path.join(REPO, "scale_data", "pairs1m")
OUT = os.path.join(REPO, "CORRECTNESS_PAIRS1M_r11.json")


def gen_corpus(spark) -> None:
    """documents.parquet = family docs ∪ sf1 organic docs."""
    fam = (
        spark.range(N_FAMILIES)
        .select(F.col("id").alias("family"))
        .select(
            "family",
            F.explode(F.sequence(F.lit(0), F.lit(FAMILY_SIZE - 1))).alias(
                "member"
            ),
        )
    )
    pos = F.sequence(F.lit(0), F.lit(N_TOKENS - 1))
    text = F.array_join(
        F.transform(
            pos,
            lambda p: F.when(
                p == F.col("member"),
                F.concat(
                    F.lit("u"),
                    F.col("family").cast("string"),
                    F.lit("x"),
                    F.col("member").cast("string"),
                ),
            ).otherwise(
                F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("family"), p), F.lit(VOCAB)
                    ).cast("string"),
                )
            ),
        ),
        " ",
    )
    fam_docs = fam.select(
        (
            F.lit(FAMILY_ID_BASE)
            + F.col("family") * 100
            + F.col("member")
        ).alias("doc_id"),
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic_family").alias("source"),
    ).withColumn("n_chars", F.length("text"))

    organic = spark.read.parquet(
        os.path.join(REPO, "scale_data", "sf1", "documents.parquet")
    ).select("doc_id", "text", "lang", "source", "n_chars")
    # match the organic dtypes exactly so the union is cast-free
    fam_docs = fam_docs.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in organic.schema.fields
        ]
    )
    (
        fam_docs.unionByName(organic)
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(DATA_DIR, "documents.parquet"))
    )


def main() -> int:
    keep = "--keep-data" in sys.argv
    spark = get_spark("check-pairs1m", shuffle_partitions=32)
    from psweep_spark.caching import clear_query_caches, registered_caches
    from psweep_spark.operators.dedup import minhash_dedup
    from psweep_spark.queries_catalog import QUERIES

    report: dict = {
        "n_families": N_FAMILIES,
        "family_size": FAMILY_SIZE,
        "expected_family_pairs": N_FAMILIES
        * FAMILY_SIZE
        * (FAMILY_SIZE - 1)
        // 2,
    }

    t0 = time.perf_counter()
    gen_corpus(spark)
    report["gen_sec"] = round(time.perf_counter() - t0, 2)
    docs = spark.read.parquet(os.path.join(DATA_DIR, "documents.parquet"))
    report["n_docs"] = docs.count()

    # --- pair relation itself: the dial must genuinely be exceeded ---
    t0 = time.perf_counter()
    pairs = minhash_dedup(
        docs, num_hashes=12, bands=4, threshold=0.5, max_bucket_size=None
    ).select("id_a", "id_b")
    n_pairs = pairs.count()
    report["pairs_sec"] = round(time.perf_counter() - t0, 2)
    report["n_pairs"] = n_pairs
    report["pairs_exceed_threshold"] = n_pairs > 1_000_000

    # --- dedup_clusters: star-contraction branch on real data ---
    clear_query_caches(spark, gc=True)
    t0 = time.perf_counter()
    cl = QUERIES["dedup_clusters"](spark, DATA_DIR)
    plan_cl = cl._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    fam_rows = (
        cl.filter(F.col("doc_id") >= FAMILY_ID_BASE)
        .select("doc_id", "cluster_id")
        .collect()
    )
    report["clusters_sec"] = round(time.perf_counter() - t0, 2)
    # the >threshold path must NOT have landed the graph driver-side
    report["clusters_plan_distributed"] = "LocalTableScan" not in plan_cl

    by_family: dict[int, set] = {}
    cluster_of_family: dict[int, set] = {}
    bad_cluster_ids = 0
    for r in fam_rows:
        fam_id = (r["doc_id"] - FAMILY_ID_BASE) // 100
        by_family.setdefault(fam_id, set()).add(r["doc_id"])
        cluster_of_family.setdefault(fam_id, set()).add(r["cluster_id"])
        # CC labels clusters by min reachable node: a family's label
        # must be its own member 0 — anything else means the family
        # merged with an organic doc or another family
        if r["cluster_id"] != FAMILY_ID_BASE + fam_id * 100:
            bad_cluster_ids += 1
    families_complete = sum(
        1 for s in by_family.values() if len(s) == FAMILY_SIZE
    )
    families_one_cluster = sum(
        1 for s in cluster_of_family.values() if len(s) == 1
    )
    report["families_seen"] = len(by_family)
    report["families_complete"] = families_complete
    report["families_one_cluster"] = families_one_cluster
    report["family_rows_with_foreign_cluster_id"] = bad_cluster_ids
    # no organic doc may adopt a family cluster label
    organic_in_family_clusters = (
        cl.filter(
            (F.col("doc_id") < FAMILY_ID_BASE)
            & (F.col("cluster_id") >= FAMILY_ID_BASE)
        ).count()
    )
    report["organic_docs_in_family_clusters"] = organic_in_family_clusters
    clusters_ok = (
        len(by_family) == N_FAMILIES
        and families_complete == N_FAMILIES
        and families_one_cluster == N_FAMILIES
        and bad_cluster_ids == 0
        and organic_in_family_clusters == 0
    )
    report["clusters_construction_oracle_ok"] = clusters_ok

    # --- leakage-safe split: ckpt landing branch at default dial ---
    clear_query_caches(spark, gc=True)
    t0 = time.perf_counter()
    ls = QUERIES["docs_leakage_safe_split"](spark, DATA_DIR)
    tags = registered_caches()
    plan_ls = ls._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    rows = {r["split"]: r.asDict() for r in ls.collect()}
    report["leakage_split_sec"] = round(time.perf_counter() - t0, 2)
    report["ckpt_tag_registered"] = "leakage_split_pairs:ckpt" in tags
    report["leakage_plan_distributed"] = "LocalTableScan" not in plan_ls
    report["split_rows"] = rows
    n_total = sum(r["n_docs"] for r in rows.values())
    leaked = {r["leaked_pairs"] for r in rows.values()}
    leaked_naive = {r["leaked_pairs_naive"] for r in rows.values()}
    split_ok = (
        n_total == report["n_docs"]
        and leaked == {0}
        and all(v > 0 for v in leaked_naive)
    )
    report["split_construction_oracle_ok"] = split_ok

    report["ok"] = bool(
        report["pairs_exceed_threshold"]
        and report["clusters_plan_distributed"]
        and report["ckpt_tag_registered"]
        and report["leakage_plan_distributed"]
        and clusters_ok
        and split_ok
    )
    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)
    print(json.dumps(report, indent=2, sort_keys=True))
    if not keep:
        shutil.rmtree(DATA_DIR, ignore_errors=True)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

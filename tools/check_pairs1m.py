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
  by ``xxhash64(family, pos)`` from a 5000-token vocabulary) whose
  LAST position holds the ONE member-unique token — so every member
  carries exactly ONE member-unique 3-gram shingle (the trailing one)
  over a 57-shingle shared core: within-family pairwise Jaccard is
  57/59 ≈ 0.97, across families ≈ 0.  Verified pairs therefore number
  ~``N_FAMILIES × C(FAMILY_SIZE, 2)`` — quadratic in family size, so
  1.3M pairs cost only 90k docs.
* the full sf1 documents table (50k real docs) is unioned in as
  organic mass so banding runs over realistic text too.

Why the unique token sits at a FIXED position (r11 fix): minhash
deviations are correlated PER MEMBER, not independent per pair — a
member whose signature deviates from the family core in all 4 bands
shares no band bucket with ANY sibling and vanishes from the pair
graph entirely.  The first cut of this tool substituted the unique
token at position ``member`` (≈6 unique shingles/member); deviation
probability ≈ 6/64 per hash made P(member invisible) ≈ 0.25⁴ ≈ 4e-3 —
~350 vanished members across 90k, which the run duly observed (2708/
3000 families came back whole; the engine was right, the tool's
"~1e-8" independence math was wrong).  With ONE unique shingle the
deviation probability is ≈ 1/58 per hash, P(band dirty) ≈ 0.05, and
under INDEPENDENT hash families P(member invisible) ≈ 0.05⁴ ≈ 6e-6.

**Engine finding this tool surfaced (r11)**: the corpus redesign
recovered ``families_one_cluster`` to 3000/3000 but ~0.3% of members
still vanish — 500× the independent-family bound.  Cause, in
``minhash_signatures`` (operators/dedup.py): the k hash families are
affine mixes ``(a_i·h30 + b_i) mod (2³¹−1)`` of ONE 30-bit md5 base
hash with tiny multipliers ``a_i = 2i+1`` — maps with ≤a_i monotonic
segments, i.e. largely ORDER-PRESERVING, so family argmins are
strongly correlated: a unique shingle that draws the globally minimal
base hash (P ≈ 1/58) tends to win families in ALL four bands at once.
Invisibility therefore scales like O(1/n_shingles), not (band-dirty)⁴.
Precision is untouched (exact verification), and average pair recall
stays near the banding formula (~99.5% measured here), but TAIL
recall — the "every member of a 30-strong boilerplate family is
found" guarantee — loses ~2.5 orders of magnitude.  The fix LANDED
later in r11 (index format v3 + migration, DuckDB oracles in lockstep
via the shared ``minhash_family_constants``): splitmix64-derived
random multipliers make the affine maps behave like independent
permutations at identical cost.  ``family_members_invisible`` is the
regression metric — 280/90,000 under the correlated v2 family, vs
≈ 0.5 expected under independence — and with the fix in it GATES
``ok`` at ≤ 20 (generous vs the ~6e-6 bound, 14× below the defect
level).

Construction oracle, two layers:

* HARD (exact, no sampling argument, gates ``ok``): an independent
  driver-side union-find over the COLLECTED pair relation — the same
  deterministic relation ``minhash_dedup`` hands
  ``connected_components`` — must reproduce ``dedup_clusters``'s
  (doc_id, cluster_id) output EXACTLY, labels included (cluster label
  = component min).  Any mismatch is an engine defect in the
  landing/star-contraction path, full stop.  Likewise the
  leakage-safe split must place every verified pair intact
  (leaked_pairs == 0) while the naive per-doc split provably leaks,
  with doc counts conserved; every family whose members ARE in the
  pair graph must come back as exactly one cluster; and no organic
  doc may adopt a family cluster label.
* TAIL-RECALL (gates ``ok`` now that the v3 family fix is in):
  ``family_members_invisible <= 20``; ``families_complete`` is
  reported alongside (not gated at exactly N_FAMILIES because even
  the independence bound leaves P(≥1 invisible) ≈ 0.4 per run).

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
    # member-unique token at the FIXED last position: exactly one
    # member-unique shingle over a 57-shingle shared core (see module
    # docstring for why NOT at position ``member``)
    pos = F.sequence(F.lit(0), F.lit(N_TOKENS - 1))
    text = F.array_join(
        F.transform(
            pos,
            lambda p: F.when(
                p == F.lit(N_TOKENS - 1),
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
    # Same parameters as the dedup_clusters catalog entry
    # (queries_scale.py) — minhash_dedup is deterministic, so this IS
    # the relation the queries below cluster and split on.
    t0 = time.perf_counter()
    pairs = minhash_dedup(
        docs, num_hashes=12, bands=4, threshold=0.5, max_bucket_size=None
    ).select("id_a", "id_b")
    pair_rows = pairs.collect()
    n_pairs = len(pair_rows)
    report["pairs_sec"] = round(time.perf_counter() - t0, 2)
    report["n_pairs"] = n_pairs
    report["pairs_exceed_threshold"] = n_pairs > 1_000_000

    # Independent union-find over the collected relation: the HARD
    # construction oracle for the clustering below (labels = component
    # min, matching the CC contract).
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for r in pair_rows:
        a, b = find(r["id_a"]), find(r["id_b"])
        if a != b:
            if a < b:
                parent[b] = a
            else:
                parent[a] = b
    expected = {}
    for r in pair_rows:
        for node in (r["id_a"], r["id_b"]):
            if node not in expected:
                expected[node] = find(node)
    del pair_rows

    # --- dedup_clusters: star-contraction branch on real data ---
    clear_query_caches(spark, gc=True)
    t0 = time.perf_counter()
    cl = QUERIES["dedup_clusters"](spark, DATA_DIR)
    plan_cl = cl._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    cl_rows = cl.select("doc_id", "cluster_id").collect()
    report["clusters_sec"] = round(time.perf_counter() - t0, 2)
    # the >threshold path must NOT have landed the graph driver-side
    report["clusters_plan_distributed"] = "LocalTableScan" not in plan_cl

    # HARD gate: exact parity with the independent union-find, labels
    # included (both contracts label a cluster by its min member).
    got = {r["doc_id"]: r["cluster_id"] for r in cl_rows}
    missing = len(expected.keys() - got.keys())
    extra = len(got.keys() - expected.keys())
    mislabeled = sum(
        1 for k, v in got.items() if k in expected and expected[k] != v
    )
    report["unionfind_nodes"] = len(expected)
    report["unionfind_missing_from_engine"] = missing
    report["unionfind_extra_in_engine"] = extra
    report["unionfind_mislabeled"] = mislabeled
    clusters_ok = missing == 0 and extra == 0 and mislabeled == 0
    report["clusters_construction_oracle_ok"] = clusters_ok

    # DIAGNOSTIC layer: family-shape sanity under the ~6e-6 per-member
    # invisibility bound (see module docstring) — generous floor, not a
    # correctness gate.
    by_family: dict[int, set] = {}
    cluster_of_family: dict[int, set] = {}
    for r in cl_rows:
        if r["doc_id"] < FAMILY_ID_BASE:
            continue
        fam_id = (r["doc_id"] - FAMILY_ID_BASE) // 100
        by_family.setdefault(fam_id, set()).add(r["doc_id"])
        cluster_of_family.setdefault(fam_id, set()).add(r["cluster_id"])
    families_complete = sum(
        1 for s in by_family.values() if len(s) == FAMILY_SIZE
    )
    families_one_cluster = sum(
        1 for s in cluster_of_family.values() if len(s) == 1
    )
    organic_in_family_clusters = sum(
        1
        for r in cl_rows
        if r["doc_id"] < FAMILY_ID_BASE and r["cluster_id"] >= FAMILY_ID_BASE
    )
    members_seen = sum(len(s) for s in by_family.values())
    report["families_seen"] = len(by_family)
    report["families_complete"] = families_complete
    report["families_one_cluster"] = families_one_cluster
    report["family_members_invisible"] = (
        N_FAMILIES * FAMILY_SIZE - members_seen
    )
    report["organic_docs_in_family_clusters"] = organic_in_family_clusters
    # HARD family-layer gates: every family present, each one cluster,
    # zero organic adoption, and — now that the v3 decorrelated hash
    # families are in — the tail-recall bound itself (module
    # docstring): invisible members must sit near the independence
    # expectation (~0.5), not the correlated-family defect level (280).
    family_shape_ok = (
        len(by_family) == N_FAMILIES
        and families_one_cluster == N_FAMILIES
        and organic_in_family_clusters == 0
        and report["family_members_invisible"] <= 20
    )
    report["family_shape_hard_ok"] = family_shape_ok
    del cl_rows, got, expected

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
        and family_shape_ok
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

"""The full ANN serving-index lifecycle: build → serve → append →
delete → health stats → compact (purges) → serve (identically) →
rebuild decision.

This is the maintenance story a 100 TB embedding store runs on a
schedule (mirrors production FAISS-on-object-store deployments):

1. ``write_ivf_index`` — one corpus pass builds the cell-partitioned
   parquet layout (queries prune to their ``nprobe`` cell DIRECTORIES
   before any row IO).
2. ``ivf_index_topk`` — serve a query batch.
3. ``ivf_index_append`` — live ingestion: per-batch nearest-cell
   assignment against the frozen centroids, ``mode=append`` part files
   land inside the affected cell dirs only.  Cost ∝ batch.
4. ``ivf_index_delete`` — tombstone append (zero cell IO); deleted
   vectors vanish from answers immediately via a broadcast anti-join.
5. ``ivf_cell_stats`` — per-cell files/rows/bytes: the health metrics.
6. ``ivf_index_compact`` — rewrite ONLY append-churned and
   tombstone-dirty cells; deleted rows are physically purged and the
   fully-applied tombstone set cleared; untouched cells keep their
   exact bytes, and answers are contractually identical before/after.
7. Rebuild policy: when row-count skew across cells grows past ~4× the
   median, the coarse quantizer no longer balances the data — schedule
   a re-cluster (``write_ivf_index`` to a fresh path, flip a pointer).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def main() -> int:
    import statistics

    import psweep_spark as ps
    from psweep_spark.operators.similarity import (
        ivf_cell_stats,
        ivf_index_append,
        ivf_index_compact,
        ivf_index_delete,
        ivf_index_topk,
        write_ivf_index,
    )
    from pyspark.sql import functions as F

    spark = ps.get_spark("example-ann-lifecycle")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    base = emb.filter(F.col("vec_id") % 2 == 0)
    queries = emb.filter(F.col("vec_id") < 8)
    path = os.path.join(tempfile.mkdtemp(prefix="psq_ann_"), "idx")

    # 1. build
    write_ivf_index(base, path)
    # 2. serve
    before = ivf_index_topk(spark, path, queries, k=3, nprobe=2)
    n_before = before.count()
    print(f"serving: {n_before} (query, rank) results")

    # 3. live ingestion: five small appends (each lands new part files)
    arriving = emb.filter(F.col("vec_id") % 2 == 1)
    for i in range(5):
        n = ivf_index_append(
            spark, path, arriving.filter(F.col("vec_id") % 10 == 2 * i + 1)
        )
        print(f"append batch {i}: {n} vectors")

    # 4. delete: GDPR-style takedown of a vec_id batch — tombstones only
    victims = [r["vec_id"] for r in ivf_index_topk(
        spark, path, queries, k=1, nprobe=2).collect()]
    n_del = ivf_index_delete(spark, path, victims)
    print(f"deleted {n_del} vectors (tombstoned, zero cell IO)")
    logical = {tuple(r) for r in ivf_index_topk(
        spark, path, queries, k=3, nprobe=2).collect()}
    assert not {t[1] for t in logical} & set(victims)

    # 5. health stats → 6. compact the churned cells (purges tombstones)
    stats = ivf_cell_stats(spark, path)
    churned = [s["cell"] for s in stats if s["n_files"] > 4]
    print(f"cells: {len(stats)}, churned (>4 files): {churned}")
    report = ivf_index_compact(spark, path, max_files_per_cell=4)
    print(
        f"compacted {report['compacted_cells']}: "
        f"{report['files_before']} -> {report['files_after']} files, "
        f"purged {report['purged_rows']} deleted rows"
    )

    # serving answers must be identical across compaction (and the
    # logical deletes must now be physical)
    a = {tuple(r) for r in ivf_index_topk(
        spark, path, queries, k=3, nprobe=2).collect()}
    assert a == logical
    post_stats = ivf_cell_stats(spark, path)
    assert all(s["n_files"] <= 4 for s in post_stats), post_stats

    # 7. rebuild decision from the same stats
    rows = [s["n_rows"] for s in post_stats]
    skew = max(rows) / max(1, statistics.median(rows))
    print(f"cell-size skew {skew:.2f}x median -> "
          + ("REBUILD (re-cluster)" if skew > 4 else "healthy"))
    print("ann lifecycle example OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

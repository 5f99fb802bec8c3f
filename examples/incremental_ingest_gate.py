"""Steady-state ingestion dedup: provision the corpus LSH index ONCE,
then gate every arriving batch against it — the production update flow
(daily crawl / streaming feed vs the lake).

Shows the three-step lifecycle the operators are designed around:

1. ``write_dedup_index(corpus, path)`` — one O(|corpus|) build, stored
   sorted so batch probes row-group-skip (a separate pipeline step,
   like writing the corpus itself).
2. ``read_dedup_index`` + ``minhash_dedup_incremental(batch, ...)`` —
   per-batch cost ∝ the batch's bucket collisions, never ∝ corpus; no
   corpus text is rescanned (the catalog's plan contract pins this).
3. Concurrent sweep appends: two `run()` calls land in ONE database
   with non-colliding ids/seqs (lockfile seq reservation +
   stage-then-commit append), the multi-writer reality of a shared
   experiment store.
"""

import os
import sys
import tempfile
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def main() -> int:
    import psweep_spark as ps
    from psweep_spark.operators.dedup import (
        minhash_dedup_incremental,
        read_dedup_index,
        write_dedup_index,
    )
    from pyspark.sql import functions as F

    spark = ps.get_spark("example-ingest-gate")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    feed = docs.filter(F.col("doc_id") % 10 == 0)

    with tempfile.TemporaryDirectory() as tmp:
        # 1. provision the index (once per corpus version)
        idx = os.path.join(tmp, "lsh_index")
        write_dedup_index(corpus, idx, num_hashes=12, bands=4)
        banding, shingles, params = read_dedup_index(spark, idx)

        # 2. gate two "daily" batches — each probe scans only the index
        flagged_total = 0
        for day in (0, 1):
            batch = feed.filter((F.col("doc_id") / 10 % 2) == day)
            flagged = minhash_dedup_incremental(
                batch,
                corpus_banding=banding,
                corpus_shingles=shingles,
                threshold=0.5,
                **params,
            )
            n = flagged.count()
            flagged_total += n
            print(f"day {day}: {n} near-dup pairs flagged against corpus")

        # 3. two concurrent sweeps into one shared database
        calc = os.path.join(tmp, "calc")

        errors: list[BaseException] = []

        def sweep(vals):
            try:
                ps.run(
                    spark,
                    lambda p: {"y_": p["a"] * 2.0},
                    ps.plist("a", vals),
                    calc_dir=calc,
                )
            except BaseException as e:  # noqa: BLE001 — surface, don't swallow
                errors.append(e)

        t1 = threading.Thread(target=sweep, args=([1, 2, 3],))
        t2 = threading.Thread(target=sweep, args=([10, 20],))
        t1.start(); t2.start(); t1.join(); t2.join()
        if errors:
            raise errors[0]
        db = ps.Database(os.path.join(calc, "database")).load(spark)
        n_rows = db.count()
        n_seqs = db.select("_pset_seq").distinct().count()
        print(f"concurrent sweeps: {n_rows} rows, {n_seqs} distinct seqs")
        assert n_rows == 5 and n_seqs == 5
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

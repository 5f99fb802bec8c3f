"""Streaming → experiment DB: windowed event aggregates append into the
same Parquet database `run()` writes (beyond-reference surface; the
file source is a format swap from Kafka).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def main() -> int:
    import psweep_spark as ps
    from psweep_spark.streaming import events_stream, stream_to_database, tumbling_counts

    spark = ps.get_spark("example-stream-db")
    base = tempfile.mkdtemp(prefix="psx_stream_")

    ev = events_stream(spark, os.path.join(SF_DIR, "events.parquet"))
    q = stream_to_database(
        tumbling_counts(ev),
        database_dir=os.path.join(base, "database"),
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    q.awaitTermination(300)

    db = ps.Database(os.path.join(base, "database")).load(spark)
    assert db.count() > 0
    assert "_run_id" in db.columns and "window_start" in db.columns
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

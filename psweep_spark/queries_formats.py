"""Format round-trips, stream-stream joins, and embedding
quantization — registered into the shared catalog with DuckDB oracles.

Round-trips prove the source/sink surface (SURVEY §2.3 #27): the data
leaves Parquet, lands in the target format via a distributed sink, and
is read back value-identical.  The streaming join proves the
interval-bounded stream-stream join (watermark state eviction on both
sides).  Quantization is the storage-shrink stage of an embedding
pipeline (float32 → int8 ≈ 4× smaller index)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psweep_spark.queries_catalog import _arr_csv, _ld, _ld_events, _mem_name, _q


@_q(
    "source_json_roundtrip",
    """
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part WHERE p_size <= 25
    """,
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → distributed JSON-lines sink → JSON source (schema
    inference), value-checked through the round-trip (the reference's
    df_to_json surface, psweep.py:454-474). JSON numbers come back as
    bigint — cast pins the schema contract."""
    from .sources import read_table, write_table

    base = tempfile.mkdtemp(prefix="psq_json_")
    pa = _ld(spark, sf_dir, "part").filter(F.col("p_size") <= 25).select(
        "p_partkey", "p_name", "p_brand", "p_size"
    )
    out = os.path.join(base, "part_json")
    write_table(pa, out, fmt="json")
    return read_table(spark, out, fmt="json").select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        "p_name",
        "p_brand",
        F.col("p_size").cast("int").alias("p_size"),
    )


@_q(
    "source_orc_roundtrip",
    """
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → ORC sink → ORC source. ORC is schema-full (no inference
    lossage) — the round-trip must be bit-identical including doubles."""
    from .sources import read_table, write_table

    base = tempfile.mkdtemp(prefix="psq_orc_")
    su = _ld(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    out = os.path.join(base, "supplier_orc")
    write_table(su, out, fmt="orc")
    return read_table(spark, out, fmt="orc")


@_q(
    "stream_view_purchase_join",
    """
    SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts >= p.ts - INTERVAL 10 MINUTE
     AND v.ts <= p.ts
    """,
)
def stream_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases matched to the same
    user's views in the preceding 10 minutes. Both sides carry a
    30-minute watermark, so each side's state store evicts rows older
    than watermark − interval — bounded state at unbounded input, the
    only way a stream-stream join survives at 100 TB/day. Drained with
    AvailableNow; must equal the batch self-join exactly."""
    from .streaming import (
        events_stream,
        run_available_now,
        state_partitions_for_volume,
    )

    path = os.path.join(sf_dir, "events.parquet")
    views = (
        events_stream(spark, path)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "30 minutes")
    )
    purchases = (
        events_stream(spark, path)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    j = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "inner",
    ).select("purchase_id", "view_id", "user_id")
    # A stream-stream join commits FOUR state stores per partition per
    # micro-batch; for this bounded drain the volume-derived count hits
    # its floor of 2 — 8 -> 2 saved ~0.4 s with identical output (r11;
    # the stream_cms_freq precedent) — while a 100 TB feed scales the
    # count with the data instead of inheriting a demo constant
    # (VERDICT r11 #8).  State partitioning never changes results.
    return run_available_now(
        j,
        _mem_name("vpjoin"),
        output_mode="append",
        state_partitions=state_partitions_for_volume(path),
    )


@_q(
    "embed_quantize_int8",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    s AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) AS max_abs
      FROM v
    )
    SELECT vec_id,
           round(max_abs, 6) AS scale_max_abs,
           array_to_string(
             CASE WHEN max_abs = 0 THEN list_transform(e, x -> 0)
                  ELSE list_transform(e,
                         x -> CAST(round(x * 127.0 / max_abs) AS BIGINT))
             END, ',') AS q_int8_csv
    FROM s
    """,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization per embedding: q_i = round(x_i ·
    127/max|x|) — the storage-shrink stage before an ANN index (4×
    smaller than float32, dot products stay sign-correct). Pure per-row
    JVM array math (transform + array_max), zero shuffle; rides inside
    the scan at any corpus size. Both engines round half away from
    zero."""
    emb = _ld(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    df = emb.select("vec_id", e.alias("e")).withColumn(
        "max_abs", F.array_max(F.transform(F.col("e"), F.abs))
    )
    q = F.when(
        F.col("max_abs") == 0,
        F.transform(F.col("e"), lambda _: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            F.col("e"),
            lambda x: F.round(x * 127.0 / F.col("max_abs")).cast("long"),
        )
    )
    return df.select(
        "vec_id",
        F.round(F.col("max_abs"), 6).alias("scale_max_abs"),
        _arr_csv(q).alias("q_int8_csv"),
    )


@_q(
    "stream_dedup_events",
    """
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion dedup (dropDuplicatesWithinWatermark): the
    stream is fed every event TWICE (union with itself — at-least-once
    delivery simulated); exactly-once semantics are restored by keyed
    dedup state bounded by the watermark, so state size is
    O(events per watermark window), not O(stream history). The drained
    result must equal batch aggregation over the ORIGINAL events."""
    from .streaming import events_stream, run_available_now

    path = os.path.join(sf_dir, "events.parquet")
    ev = events_stream(spark, path)
    dup = ev.unionByName(events_stream(spark, path))
    deduped = (
        dup.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out = run_available_now(
        deduped.select("event_id", "event_type", "user_id"),
        _mem_name("dedupstream"),
        output_mode="append",
    )
    return out.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@_q(
    "stream_static_enrich",
    """
    SELECT c_mktsegment, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id % 1500 = c_custkey % 1500
                             AND c_custkey <= 1500
    GROUP BY c_mktsegment
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the live event stream enriched against a
    slowly-changing dimension (customer) that Spark re-plans per
    micro-batch — the standard pattern for joining a Kafka stream with
    a warehouse dim without restarting the query. The dim side is
    broadcast into every micro-batch; no stream state at all (unlike
    stream-stream). Synthetic key: user_id mod |customers|."""
    from .streaming import events_stream, run_available_now

    ev = events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    cu = (
        _ld(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 1500)
        .select(
            F.pmod(F.col("c_custkey"), F.lit(1500)).alias("ckey"),
            "c_mktsegment",
        )
    )
    j = ev.withColumn("ukey", F.pmod(F.col("user_id"), F.lit(1500))).join(
        F.broadcast(cu), F.col("ukey") == F.col("ckey")
    )
    agg = j.select("event_type", "c_mktsegment", "value")
    out = run_available_now(agg, _mem_name("enrich"), output_mode="append")
    return out.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
        .alias("total_value"),
    )


@_q(
    "q_pandas_udf_weighted_avg",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
             / CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / 100.0
             AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pandas_udf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched grouped-aggregate Pandas UDF (the sanctioned slow
    path when an aggregate has no Catalyst expression): quantity-
    weighted mean price per returnflag, computed in numpy per group.
    Inputs are quantized to exact int64 cents/units BEFORE the UDF so
    numpy's pairwise summation and SQL's sequential fold agree bit-for-
    bit. Partial aggregation does NOT apply to grouped-agg UDFs — each
    group's rows colocate on one executor, the documented trade vs
    built-ins (use only when expressions can't say it)."""
    from pyspark.sql.functions import pandas_udf

    li = _ld(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
    )

    @pandas_udf("double")
    def wavg(cents: pd.Series, qty: pd.Series) -> float:
        num = (cents.astype("int64") * qty.astype("int64")).sum()
        den = qty.astype("int64").sum()
        return float(num) / float(den) / 100.0

    return li.groupBy("l_returnflag").agg(
        wavg(F.col("cents"), F.col("qty")).alias("wavg_price")
    )


@_q(
    "events_props_variant",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(CAST(json_extract(props, '$.k') AS VARCHAR) AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MAX(CAST(CAST(json_extract(props, '$.k') AS VARCHAR) AS BIGINT))
                AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via the VARIANT type (Spark 4):
    parse_json once into a binary variant, then typed variant_get
    paths — the open-schema ingestion pattern that replaces repeated
    get_json_object string re-parsing (one parse per row instead of one
    per extracted path; at 100 TB of event payloads that difference is
    the scan cost).  Same aggregation as the string-path twin
    `events_user_props_json`."""
    ev = _ld_events(spark, sf_dir)
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("pv")
    ).select(
        "event_type", F.variant_get(F.col("pv"), "$.k", "long").alias("k")
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


@_q(
    "source_xml_roundtrip",
    """
    SELECT s_suppkey, s_name, s_nationkey,
           CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier
    """,
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface (native in Spark 4): each supplier row serialized to
    an XML record with to_xml, parsed back with from_xml against an
    explicit schema — both directions are JVM expressions riding the
    scan (no files, no Python), proving lossless typed round-trip
    including DECIMAL→DOUBLE money."""
    su = _ld(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey",
        F.col("s_acctbal").cast("double").alias("s_acctbal"),
    )
    xml = su.select(
        F.to_xml(
            F.struct("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        ).alias("x")
    )
    parsed = xml.select(
        F.from_xml(
            "x",
            "s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT, "
            "s_acctbal DOUBLE",
        ).alias("s")
    )
    return parsed.select("s.*")

"""Similarity search over an embedding column (array<float>).

* :func:`brute_force_topk` — exact cosine top-k; the baseline and the
  oracle.  Query side is broadcast (it's small by construction), so the
  corpus scan is shuffle-free and the only shuffle is the per-query
  top-k (a tiny windowed aggregation on k·|Q| candidate rows after
  per-partition pre-ranking).
* :func:`random_hyperplanes` + :func:`lsh_topk` — sign-LSH bucketed
  approximate top-k; the 100 TB path.  Hyperplanes are generated
  driver-side from a fixed seed and embedded as literal arrays, so the
  plan stays pure Catalyst (no UDF) and is reproducible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "brute_force_topk",
    "random_hyperplanes",
    "lsh_topk",
    "cosine_expr",
    "centroids_by_label",
    "assign_nearest_centroid",
    "ivf_topk",
    "write_ivf_index",
    "ivf_index_topk",
    "ivf_index_append",
    "ivf_index_delete",
    "ivf_cell_stats",
    "ivf_index_compact",
]


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array Columns (JVM-side)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return dot / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Returns (query_id, vec_id, rank, cosine) with cosine rounded to
    6 dp and deterministic tie-break on vec_id.  The queries relation
    is broadcast; the corpus is scanned once.
    """
    from ..plans import ensure_parallelism

    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).withColumn(
        "cosine", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )


def random_hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH (driver-side)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def _sign_bucket(vec_name: str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id for the vector COLUMN named ``vec_name`` under
    the literal hyperplanes.

    Built as ONE parsed SQL expression, not num_planes·dim ``F.lit()``
    calls: every lit() is a py4j round-trip, and at 8×64 planes the
    ~1k round-trips cost ~0.8 s of DRIVER time per query construction
    (measured r11) — several times the actual execution at bench scale
    and pure planning overhead at any scale.  ``repr(float)`` is the
    shortest round-trip form, so the parsed double is bit-identical to
    the literal the lit() path produced (same contract the DuckDB
    oracle generator relies on)."""
    # backtick-quote the interpolated column name (ADVICE r11 #3): a
    # caller passing a name needing quoting (spaces/dots/hyphens) must
    # get the column reference, not a parse error or mis-binding
    vec_name = "`" + vec_name.replace("`", "``") + "`"
    terms = []
    for p, plane in enumerate(planes):
        arr = ", ".join(repr(float(w)) + "D" for w in plane)
        terms.append(
            f"CASE WHEN aggregate(zip_with({vec_name}, array({arr}),"
            " (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
            f" (acc, x) -> acc + x) > 0.0D THEN {2**p}L ELSE 0L END"
        )
    return F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    seed: int = 42,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates share the query's sign-LSH
    bucket; exact rerank within the bucket.

    Scale path: the corpus is hash-partitioned by bucket (one shuffle,
    reusable across queries if persisted); each query probes its own
    bucket plus, with ``multiprobe=1``, every 1-bit-flip neighbor
    bucket (standard multi-probe LSH) → candidate set
    ~ (1 + num_planes)·|corpus| / 2^num_planes.  Recall on genuinely
    high-cosine neighbors (near-dups) is ≈1; on near-orthogonal random
    vectors sign-LSH recall is low by construction — that's the
    accuracy/cost dial, not a bug.

    ``dim``: vector dimensionality.  Pass it when statically known (the
    catalog queries pin dim=64, same as their oracles) — the fallback
    probes the corpus with ``first()``, an extra driver job per call.
    """
    if dim is None:
        dim = len(corpus.select(F.col(vec_col)).first()[0])
    planes = random_hyperplanes(dim, num_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", _sign_bucket("cv", planes))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket0", _sign_bucket("qv", planes))
    if multiprobe >= 1:
        probes = F.array(
            F.col("bucket0"),
            *[
                F.col("bucket0").bitwiseXOR(F.lit(2**p)).cast("long")
                for p in range(num_planes)
            ],
        )
    else:
        probes = F.array(F.col("bucket0"))
    q = q.select(
        "query_id", "qv", F.explode(probes).alias("bucket")
    )
    # a candidate can collide with a query in several probed buckets —
    # dedup (query, candidate) before ranking or top-k repeats rows
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )


def _sq_l2_expr(q: Column, c: Column) -> Column:
    """Exact integer squared-L2 between two array<bigint> vectors."""
    return F.aggregate(
        F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


def assign_nearest_centroid(
    v: DataFrame,
    centroids: list[tuple[int, list[int]]],
    q_col: str = "q",
    out_col: str = "cid",
    literal_max_k: int = 256,
) -> DataFrame:
    """Nearest-centroid assignment over integer-quantized vectors —
    exact cross-engine argmin (min squared-L2, tie → lowest centroid
    id).  Returns ``v`` with ``out_col`` (int cluster id) appended.

    Scale-adaptive physical strategy:

    * ``k ≤ literal_max_k`` — the codebook is inlined as one literal
      ``array<struct<cid, cq>>``: assignment is a zero-shuffle
      projection riding the scan.  Right for k up to a few hundred;
      the task binary and expression tree carry k·d literals.
    * ``k > literal_max_k`` — SemDeDup's own k≈√N sizing reaches
      k≈10⁵ at 10¹⁰ docs, where a literal tree blows up analysis time
      and task serialization long before execution.  The codebook
      becomes a BROADCAST DataFrame: crossJoin(broadcast) scores k
      candidates per vector map-side, and a min-struct aggregation
      (partial combine) collapses them before the one shuffle — rows
      shuffled ∝ |v|, never k·|v|, and the codebook ships once per
      executor as a broadcast, not per-task in the closure.
    """
    cents = sorted((int(c), [int(x) for x in cq]) for c, cq in centroids)
    if len(cents) <= literal_max_k:
        # ONE parsed SQL string, not k·d F.lit() calls: every lit() is a
        # py4j round-trip, and at k=32×d=64 the 2048 round-trips cost
        # ~2.5 s of DRIVER time per query construction (measured) —
        # 10× the actual execution
        cb_sql = "array(" + ", ".join(
            "named_struct('cid', {c}, 'cq', array({xs}))".format(
                c=c, xs=", ".join(f"{x}L" for x in cq)
            )
            for c, cq in cents
        ) + ")"
        cb = F.expr(cb_sql)
        dists = F.transform(cb, lambda s: _sq_l2_expr(F.col(q_col), s["cq"]))
        # first position of the min ⇒ lowest cid on ties (cb is sorted)
        pos = F.array_position(dists, F.array_min(dists)).cast("int")
        return v.withColumn(out_col, F.element_at(cb, pos)["cid"])
    spark = v.sparkSession
    cdf = spark.createDataFrame(cents, "cid int, cq array<bigint>")
    scored = v.crossJoin(F.broadcast(cdf)).withColumn(
        "__dist", _sq_l2_expr(F.col(q_col), F.col("cq"))
    )
    keep = list(v.columns)
    return (
        scored.groupBy(*keep)
        .agg(F.min(F.struct(F.col("__dist"), F.col("cid"))).alias("__m"))
        .select(*keep, F.col("__m")["cid"].alias(out_col))
    )


def assign_nearest_centroid_blas(
    v: DataFrame,
    centroids: list[tuple[int, list[int]]],
    q_col: str = "q",
    out_col: str = "cid",
) -> DataFrame:
    """:func:`assign_nearest_centroid` with the k-candidate scoring done
    as ONE BLAS matmul per Arrow batch instead of k expression
    evaluations per row — the k≈√N scale path (SemDeDup sizing: k≈450
    at 200k vectors, k≈10⁵ at 10¹⁰), where both the literal codebook
    (k·d-term expression tree) and the broadcast cross-join (k·|v| rows
    scored by an INTERPRETED higher-order fold — measured ~10× slower
    than codegen arithmetic) stop scaling.

    Exactness contract (matches the expression paths bit-for-bit,
    pinned by ``test_assign_nearest_centroid_blas_identity``): the
    argmin of ``‖a−c‖²`` equals the argmin of ``‖c‖² − 2a·c`` (the
    shared ``‖a‖²`` term cancels); with ×1000-quantized inputs every
    product ≤ d·(2·max|q|)² ≈ 10⁹ ≪ 2⁵³, so the float64 matmul is
    EXACT integer arithmetic, and ``np.argmin``'s first-minimum rule
    over the cid-sorted codebook reproduces the tie → lowest-cid rule.

    Scale shape: zero shuffle — the codebook (k·d·8 bytes; 230 KB at
    k=448, 50 MB at k=10⁵) ships once per executor inside the task
    closure and the assignment rides the scan as a mapInPandas
    projection, exactly like the literal path."""
    import numpy as np
    from pyspark.sql import types as T

    cents = sorted((int(c), [int(x) for x in cq]) for c, cq in centroids)
    cids = np.asarray([c for c, _ in cents], dtype=np.int64)
    C = np.asarray([cq for _, cq in cents], dtype=np.float64)
    c_norm = (C * C).sum(axis=1)  # ‖c‖², exact integers in float64

    out_schema = T.StructType(
        list(v.schema.fields) + [T.StructField(out_col, T.IntegerType(), False)]
    )

    def mapper(batches):
        for pdf in batches:
            if len(pdf):
                a = np.asarray(
                    np.vstack(pdf[q_col].to_numpy()), dtype=np.float64
                )
                # score = ‖c‖² − 2·a·c  (row-constant ‖a‖² dropped);
                # argmin is the first minimum → lowest cid on ties
                idx = np.argmin(c_norm[None, :] - 2.0 * (a @ C.T), axis=1)
                pdf[out_col] = cids[idx].astype(np.int32)
            else:
                pdf[out_col] = np.empty(0, dtype=np.int32)
            yield pdf

    return v.mapInPandas(mapper, out_schema)


def centroids_by_label(
    corpus: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label centroid vectors (elementwise mean) — the IVF coarse
    quantizer.  Output (c_label, cv) is tiny: |labels| rows — always
    broadcastable, so downstream assignment never shuffles the corpus."""
    d = corpus.select(
        F.col(label_col).alias("c_label"),
        F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x"),
    )
    cd = d.groupBy("c_label", "pos").agg(F.avg("x").alias("cx"))
    return cd.groupBy("c_label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cx"))),
            lambda s: s["cx"],
        ).alias("cv")
    )


def assign_cells(
    df: DataFrame,
    cent: DataFrame,
    idc: str,
    vc: str,
    n: int,
) -> DataFrame:
    """Nearest-``n`` centroid cells per vector.  ``cent`` must have
    (c_label, cv2).

    The centroid table is k·d doubles — folded in-plan to a ONE-ROW
    array of (label, vector) structs and broadcast, so the assignment
    is a pure map: per row, score every centroid JVM-side, sort the
    k-element (sim, label) array, keep the top n.  ZERO corpus
    shuffle — the former crossJoin + row_number window pushed the
    k-expanded corpus relation through an Exchange (per-vector
    rank-limit pruning still leaves a full |corpus|-row shuffle; at 1B
    vectors that is a billion-row shuffle for what is semantically a
    per-row argmax).  Tie-break matches the window form exactly: max
    sim (rounded 6 dp), then LOWEST label.

    Contract: ``c_label`` must be NUMERIC (the descending tie-break is
    implemented by negating the label inside the sort struct, and the
    cell id is cast to int downstream — both would silently misorder or
    fail analysis on string labels), and ``cent`` must be non-empty (an
    empty quantizer would otherwise explode to zero rows and read as
    "no neighbors" instead of "no index").  The label type is checked
    at plan-build time; emptiness is enforced IN-PLAN on the one-row
    folded relation (raise_error inside the expression that produces
    the cells), so the guard costs zero extra jobs — an isEmpty() here
    would re-run the corpus-wide centroid aggregation in the
    ivf_topk / write_ivf_index paths."""
    label_type = dict(cent.dtypes).get("c_label", "")
    if label_type not in {
        "tinyint", "smallint", "int", "bigint", "float", "double",
    } and not label_type.startswith("decimal"):
        raise TypeError(
            f"assign_cells requires a numeric c_label column, got "
            f"{label_type!r} — map string labels to dense ints before "
            "building the quantizer"
        )
    centarr = cent.agg(
        F.collect_list(F.struct("c_label", "cv2")).alias("_cents")
    )
    ranked = F.slice(
        F.reverse(
            F.array_sort(
                F.transform(
                    "_cents",
                    lambda c: F.struct(
                        F.round(
                            cosine_expr(F.col(vc), c["cv2"]), 6
                        ).alias("sim"),
                        (-c["c_label"]).alias("neg_label"),
                    ),
                )
            )
        ),
        1,
        n,
    )
    top = F.when(
        F.size("_cents") == 0,
        F.raise_error(
            F.lit(
                "assign_cells: empty centroid table — the coarse "
                "quantizer has no cells (build the index first)"
            )
        ),
    ).otherwise(ranked)
    return (
        df.crossJoin(F.broadcast(centarr))
        .select(F.col(idc), F.col(vc), F.explode(top).alias("t"))
        .select(idc, vc, (-F.col("t.neg_label")).cast("int").alias("cell"))
    )


CENTROIDS_SUBDIR = "_psweep_centroids"  # leading _: invisible to readers
TOMBSTONES_SUBDIR = "_psweep_tombstones"  # logical deletes, see ivf_index_delete


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> None:
    """Materialize the IVF index as a **cell-partitioned parquet
    layout**: one directory per coarse cell plus the centroid table
    under ``_psweep_centroids`` (the ``_`` prefix keeps it out of the
    data reader's listing).

    This is the 100 TB ANN serving shape: the assignment scan is paid
    ONCE at build time; every query afterwards reads only its
    ``nprobe`` cell directories — directory-level partition pruning,
    before any row IO (see :func:`ivf_index_topk` and the
    PartitionFilters plan contract in tests)."""
    cent = centroids_by_label(corpus, vec_col, label_col).withColumnRenamed(
        "cv", "cv2"
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    cells = assign_cells(c, cent, "vec_id", "cv", 1)
    (
        cells.select("vec_id", F.col("cv").alias("v"), "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    cent.select(F.col("c_label"), F.col("cv2").alias("cv")).write.mode(
        "overwrite"
    ).parquet(f"{path}/{CENTROIDS_SUBDIR}")


def ivf_index_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incrementally add vectors to an existing :func:`write_ivf_index`
    layout — index MAINTENANCE, the op a live ingestion pipeline runs
    per batch instead of rebuilding the index.

    The frozen centroid table is reused (an IVF index's cells are fixed
    at build time — rebalancing is a rebuild, exactly like production
    FAISS-on-object-store layouts), so the append is: assign the new
    batch to cells against the broadcast centroids, then
    ``mode=append`` into the cell-partitioned parquet — new part files
    land INSIDE the affected cell directories only; existing files are
    never touched, readers see the union, and directory pruning keeps
    working unchanged.  Cost ∝ batch size, zero corpus IO.

    Returns the number of appended rows.  Contracts (tested): every
    appended vector lands in its nearest-centroid cell under the
    index's metric, and batching granularity is invisible — N small
    appends answer every query exactly like one big append.  (A
    rebuild on the grown corpus would move the centroids themselves;
    periodic re-clustering is a separate, scheduled rebuild, exactly
    as in production IVF deployments.)"""
    cent = spark.read.parquet(f"{path}/{CENTROIDS_SUBDIR}").withColumnRenamed(
        "cv", "cv2"
    )
    c = new_vectors.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    cells = assign_cells(c, cent, "vec_id", "cv", 1)
    out = cells.select("vec_id", F.col("cv").alias("v"), "cell")
    # Count via observe() DURING the append write: the assignment plan
    # runs exactly once, and the returned count is the number of rows
    # the write job actually processed — a failed write raises instead
    # of reporting a phantom positive count to a caller that resumes.
    obs = Observation()
    out.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "append"
    ).partitionBy("cell").parquet(path)
    return int(obs.get["n"])


def ivf_index_delete(
    spark,
    path: str,
    ids,
    id_col: str = "vec_id",
) -> int:
    """Logically delete vectors from a :func:`write_ivf_index` layout —
    the last quarter of the index lifecycle (build → append → compact →
    **delete**).

    Deletion is a TOMBSTONE append, the only shape that scales: the
    deleted ids land as a tiny parquet batch under
    ``_psweep_tombstones`` (the ``_`` prefix keeps it out of the data
    reader's listing), cost ∝ |delete batch|, ZERO cell IO — no cell
    file is opened, let alone rewritten.  :func:`ivf_index_topk`
    anti-joins the tombstone set (small → broadcast) before ranking, so
    deleted vectors disappear from answers immediately;
    :func:`ivf_index_compact` later applies the tombstones PHYSICALLY
    while it is rewriting cells anyway, then clears the fully-applied
    set.  This is exactly the delete story of production
    LSM/Iceberg-style layouts: logical-now, physical-at-compaction.

    ``ids`` is a DataFrame with an ``id_col`` column, or any iterable
    of ints.  Returns the number of tombstones written (idempotent at
    query time — duplicate tombstones are harmless)."""
    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame(
            [(int(i),) for i in ids], f"{id_col} long"
        )
    out = ids.select(F.col(id_col).cast("long").alias("vec_id")).distinct()
    obs = Observation()
    out.observe(obs, F.count(F.lit(1)).alias("n")).coalesce(1).write.mode(
        "append"
    ).parquet(f"{path}/{TOMBSTONES_SUBDIR}")
    return int(obs.get["n"])


def _read_tombstones(spark, path: str) -> "DataFrame | None":
    """The tombstone relation of an index, or None when there are none."""
    import os as _os

    d = f"{path}/{TOMBSTONES_SUBDIR}"
    if not _os.path.isdir(d):
        return None
    try:
        t = spark.read.parquet(d)
    except Exception:  # empty dir — unable to infer schema
        return None
    return t.select("vec_id").distinct()


def ivf_cell_stats(spark, path: str) -> "list[dict]":
    """Per-cell health metrics for a :func:`write_ivf_index` layout:
    ``[{cell, n_files, n_rows, n_bytes}, ...]`` from one directory
    listing + one footer-stats-only count scan.  This is the input to
    the REBUILD-TRIGGER POLICY documented on :func:`ivf_index_compact`:

    * many small files in a cell (append churn) → **compact** that cell
      (cheap, local to the cell, serving-equivalent);
    * row-count skew across cells — ``max(n_rows)`` beyond ~4× the
      median — → **rebuild** (re-cluster): the coarse quantizer no
      longer balances the data, probing the hot cell costs ~skew× a
      balanced probe, and no amount of file compaction fixes that.
      Rebuild is a scheduled job (write_ivf_index to a fresh path, flip
      a pointer), exactly like production FAISS-on-object-store
      deployments."""
    import os as _os

    rows = {
        int(r["cell"]): int(r["n"])
        for r in spark.read.parquet(path)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = []
    for d in sorted(_os.listdir(path)):
        if not d.startswith("cell="):
            continue
        full = _os.path.join(path, d)
        parts = [
            f for f in _os.listdir(full)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        out.append({
            "cell": int(d.split("=", 1)[1]),
            "n_files": len(parts),
            "n_rows": rows.get(int(d.split("=", 1)[1]), 0),
            "n_bytes": sum(
                _os.path.getsize(_os.path.join(full, f)) for f in parts
            ),
        })
    return out


def ivf_index_compact(
    spark,
    path: str,
    max_files_per_cell: int = 4,
    target_files_per_cell: int = 1,
) -> dict:
    """Compact append-churned cells of a :func:`write_ivf_index` layout
    — the missing third of the index lifecycle (build → append →
    **compact**; VERDICT r4 item 6).

    :func:`ivf_index_append` lands one-or-more new part files per
    affected cell per batch; after N batches a hot cell holds N small
    files and every probe pays N file opens.  Compaction rewrites ONLY
    cells whose file count exceeds ``max_files_per_cell`` — each such
    cell is read (partition-pruned scan of that directory alone),
    coalesced to ``target_files_per_cell`` file(s), written beside the
    old files, and the old files are then removed.  Cells under the
    threshold are untouched — same files, same bytes.  Serving
    equivalence is contract-tested: :func:`ivf_index_topk` answers
    identically before and after.

    When the index carries tombstones (:func:`ivf_index_delete`), the
    pass also applies them PHYSICALLY: every cell holding a tombstoned
    row joins the rewrite set (found by one vec_id-pruned scan), the
    rewrite anti-joins the tombstone relation, and — since every cell
    that contained a deleted row has now been rewritten — the
    fully-applied tombstone set is cleared.  Queries answer identically
    before and after (they already excluded tombstoned ids logically);
    only the physical bytes change.

    Returns ``{"compacted_cells": [...], "files_before": n,
    "files_after": m, "purged_rows": p}``.  File manipulation uses the
    local/NFS filesystem API (this environment's landing store); an
    object-store deployment does the same two steps through the Hadoop
    FileSystem API, and gets atomic visibility by routing the swap
    through a manifest commit (metastore.py) exactly like the
    Database's parquet appends — per-file listing semantics are
    identical."""
    import os as _os
    import shutil as _shutil

    # Crash hygiene: stale temp output from an interrupted compaction
    # lives under _compact_tmp (underscore prefix → invisible to Spark's
    # partition discovery, so a half-finished rewrite can never surface
    # duplicated rows or a string-typed 'cell' partition to readers).
    # Clear any leftover before starting this pass.
    _shutil.rmtree(_os.path.join(path, "_compact_tmp"), ignore_errors=True)
    stats = ivf_cell_stats(spark, path)
    todo = [s for s in stats if s["n_files"] > max_files_per_cell]
    tomb = _read_tombstones(spark, path)
    if tomb is not None:
        # one column-pruned scan finds the cells with deleted rows;
        # those cells must be rewritten regardless of file count
        dirty = {
            int(r["cell"])
            for r in spark.read.parquet(path)
            .join(F.broadcast(tomb), "vec_id", "left_semi")
            .select("cell")
            .distinct()
            .collect()
        }
        have = {s["cell"] for s in todo}
        todo += [s for s in stats if s["cell"] in dirty and s["cell"] not in have]
    files_before = sum(s["n_files"] for s in stats)
    compacted = []
    purged = 0
    for s in todo:
        cdir = _os.path.join(path, f"cell={s['cell']}")
        old = [
            f for f in _os.listdir(cdir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        # read THIS cell dir only (no partition column in-file), rewrite
        # coalesced into a tmp dir, then swap: new files in, old out.
        # The tmp dir sits under _compact_tmp/ (underscore prefix), so a
        # reader hitting the index mid-rewrite — or after a crash —
        # never lists it: a 'cell=N.compact.tmp' sibling would be picked
        # up by partition discovery as a bogus string-valued partition.
        tmp = _os.path.join(path, "_compact_tmp", f"cell={s['cell']}")
        cell_df = spark.read.parquet(cdir)
        if tomb is not None:
            cell_df = cell_df.join(F.broadcast(tomb), "vec_id", "left_anti")
        obs = Observation()
        (
            cell_df.observe(obs, F.count(F.lit(1)).alias("n"))
            .coalesce(max(1, target_files_per_cell))
            .write.mode("overwrite")
            .parquet(tmp)
        )
        purged += s["n_rows"] - int(obs.get["n"])
        moved = 0
        for f in sorted(_os.listdir(tmp)):
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                _os.replace(
                    _os.path.join(tmp, f),
                    _os.path.join(cdir, f"compacted-{moved:05d}-{f}"),
                )
                moved += 1
        for f in old:
            _os.unlink(_os.path.join(cdir, f))
        _shutil.rmtree(tmp, ignore_errors=True)
        compacted.append(s["cell"])
    _shutil.rmtree(_os.path.join(path, "_compact_tmp"), ignore_errors=True)
    if tomb is not None:
        # every cell that held a tombstoned row was rewritten above —
        # the tombstone set is fully applied; clear it so future probes
        # and compactions stop paying for it
        _shutil.rmtree(f"{path}/{TOMBSTONES_SUBDIR}", ignore_errors=True)
    files_after = files_before - sum(s["n_files"] for s in todo) + len(
        todo
    ) * max(1, target_files_per_cell)
    return {
        "compacted_cells": compacted,
        "files_before": files_before,
        "files_after": files_after,
        "purged_rows": purged,
    }


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    query_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a :func:`write_ivf_index` layout: assign each query to its
    ``nprobe`` nearest cells (centroid table is tiny — driver-read),
    then scan ONLY those cell partitions (``cell IN (...)`` reaches the
    scan as a PartitionFilter → directory pruning) and rerank exactly.

    Scale shape: with |cells| sized ~sqrt(corpus), a query batch
    touches nprobe/|cells| of the data regardless of corpus size; the
    probed union is bounded by |queries|·nprobe cells."""
    cent = spark.read.parquet(f"{path}/{CENTROIDS_SUBDIR}").withColumnRenamed(
        "cv", "cv2"
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    qcells = assign_cells(q, cent, "query_id", "qv", nprobe)
    probe_cells = [r["cell"] for r in qcells.select("cell").distinct().collect()]
    idx = spark.read.parquet(path).filter(F.col("cell").isin(probe_cells))
    tomb = _read_tombstones(spark, path)
    if tomb is not None:
        # logical deletes: tombstoned ids vanish from answers the moment
        # ivf_index_delete returns; the set is |deletes|-sized → broadcast
        idx = idx.join(F.broadcast(tomb), "vec_id", "left_anti")
    cand = (
        idx.join(F.broadcast(qcells), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qv"), F.col("v")), 6))
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", F.col("rank").cast("long").alias("rank"),
            "cosine",
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are
    assigned to their nearest centroid cell once; each query probes its
    ``nprobe`` nearest cells and reranks exactly inside them.

    Scale path: centroids broadcast both ways, so the expensive side is
    one corpus scan scoring |corpus|·|cells| JVM-side dot products for
    the assignment (amortizable: persist the cell assignment and reuse
    it across query batches), then an equi-join on cell id that touches
    only ~nprobe/|cells| of the corpus per query.
    """
    from ..plans import ensure_parallelism

    cent = centroids_by_label(corpus, vec_col, label_col)
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )

    cent = cent.withColumnRenamed("cv", "cv2")
    cells = assign_cells(c, cent, "vec_id", "cv", 1)
    qcells = assign_cells(q, cent, "query_id", "qv", nprobe)
    cand = (
        cells.join(F.broadcast(qcells), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )

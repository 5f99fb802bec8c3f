"""Frequency sketches — bounded-memory heavy-hitter discovery.

The 100 TB problem: "what are the most frequent items?" over a keyspace
too large to aggregate exactly (n-gram phrases, URLs, user agents —
billions of distinct values) makes the naive ``groupBy(item).count()``
shuffle vocabulary-cardinality data.  The classical fix is a two-pass
candidate/recount scheme:

1. **Candidate pass (zero shuffle)**: each partition runs a
   Misra-Gries summary with ``k`` counters — O(k) memory no matter how
   many distinct items stream through.  MG guarantees every item with
   true partition count > n_p/(k+1) survives with a positive residual;
   summing over partitions, **any item with global count > N/(k+1) is
   in some partition's summary** — the candidate set provably contains
   every global heavy hitter above that threshold.
2. **Recount pass (candidate-bounded shuffle)**: the candidate union
   (≤ k · partitions rows, usually far less) is broadcast back and the
   corpus is re-counted for candidates only — map-side partial
   aggregation makes the shuffle ∝ candidates × partitions, never
   vocabulary-cardinality.  Counts for candidates are EXACT, so the
   final top-k is exact whenever the k-th count clears the threshold
   (callers size ``k_counters`` so it does — see
   :func:`heavy_hitters_topk`).

Reference: Misra & Gries 1982 "Finding repeated elements"; the weighted
variant here follows the SpaceSaving/MG equivalence (Agarwal et al.
2013, "Mergeable summaries") — summaries from independent partitions
merge by addition, which is exactly what the recount pass exploits.

This mirrors the reference engine's scope declaration that heavy
aggregation is delegated to the dataframe engine (see SURVEY.md §2.5);
the sketch is the scale path the reference never needed at its size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(acc: "pd.Series | None", vc: pd.Series, k: int) -> pd.Series:
    """Merge a batch's exact counts into an MG summary of ≤ k counters.

    This is the MERGE form of Misra-Gries (Agarwal et al. 2013,
    "Mergeable summaries", Thm 2.2): add the count vectors, then — if
    more than k items survive — subtract the (k+1)-th largest residual
    from every item and drop the non-positive ones.  At most k items
    remain, and the total undercount of any single item across all
    merges is ≤ n/(k+1) of the items processed so far — the identical
    survival guarantee as element-wise MG, but fully VECTORIZED: the
    per-item python loop (O(k) min-scan per full-table miss — measured
    98 s single-task on a 2.7M-row partition at k=1024) becomes one
    pandas add + nlargest per Arrow batch (same data: <2 s)."""
    acc = vc if acc is None else acc.add(vc, fill_value=0)
    if len(acc) > k:
        thresh = acc.nlargest(k + 1).iloc[-1]
        acc = acc - thresh
        acc = acc[acc > 0]
    return acc


def mg_candidates(
    df: DataFrame,
    item_col: str,
    k: int,
    emit_partition_totals: bool = False,
) -> DataFrame:
    """Per-partition Misra-Gries summaries → candidate relation.

    Zero shuffle: one ``mapInPandas`` pass over the input partitions
    (repartitioned first iff the plan is under-parallel — a
    single-file scan must not serialize the sketch); each partition
    emits at most ``k`` rows ``(item, lower_bound)`` where
    ``lower_bound`` is the MG residual (≤ true partition count, and
    ≥ true − n_p/(k+1)).  Arrow batches are pre-reduced with
    ``value_counts`` and merged with the vectorized MG merge
    (:func:`_mg_merge`), so no per-row python executes.

    With ``emit_partition_totals`` each partition additionally emits
    ONE sentinel row ``(NULL, n_p)`` carrying its total row count
    (NULL cannot collide with a real item: ``value_counts`` never
    counts NULLs).  Summing sentinel ``lower_bound`` reconstructs the
    corpus size N inside the same zero-shuffle pass — the input the
    runtime MG-guarantee check (:func:`heavy_hitters_topk`
    ``exactness=``) needs, without a third corpus scan.
    """
    from ..plans import ensure_parallelism

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            acc = _mg_merge(acc, pdf[item_col].value_counts(), k)
        items: list = (
            [] if acc is None or acc.empty else list(acc.index.astype(str))
        )
        lbs: list = (
            [] if acc is None or acc.empty else list(acc.astype("int64"))
        )
        if emit_partition_totals:
            items.append(None)
            lbs.append(n_part)
        yield pd.DataFrame(
            {
                item_col: pd.array(items, dtype=object),
                "lower_bound": pd.array(lbs, dtype="int64"),
            }
        )

    out_schema = f"{item_col} string, lower_bound long"
    return ensure_parallelism(df.select(item_col)).mapInPandas(
        run, schema=out_schema
    )


def _cms_bucket(item, i: int, width: int, salt: str):
    """Deterministic CMS row-``i`` bucket: the ``i``-th disjoint 8-hex
    (32-bit) slice of ONE md5 digest, mod width.  One digest serves all
    ``depth ≤ 4`` rows — 4× less hashing than per-row salted md5 on the
    corpus-sized build pass (measured 19 → ~7 s at sf1) — and disjoint
    slices of a single md5 are independently uniform (the
    Kirsch–Mitzenmacher observation needs far less).  Pure function of
    (salt, i, item): any engine that can md5 re-derives the sketch
    bit-for-bit (same trick as sampling.hash_uniform)."""
    if not 0 <= i < 4:
        raise ValueError("CMS depth is limited to 4 rows (32-bit slices)")
    s = F.concat(
        F.lit(f"{salt}|"), F.col(item) if isinstance(item, str) else item
    )
    return (
        F.conv(F.substring(F.md5(s), 1 + 8 * i, 8), 16, 10).cast("long")
        % width
    )


def cms_cells(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms_v1",
) -> DataFrame:
    """Build a Count-Min sketch as a ``(i, col, cnt)`` relation.

    The complement to Misra-Gries: MG answers "which items are
    frequent", CMS answers "how frequent is THIS item" for arbitrary
    point queries, with overestimate ≤ εN (ε = e/width) at probability
    1−δ (δ = e^−depth) — and it is MERGEABLE: sketches of two corpora
    (or two days' increments) add cell-wise, so a 100 TB rollup keeps
    depth·width counters per unit, never the vocabulary.

    Scale shape: each row fans out map-side into ``depth`` (row,
    bucket) pairs; the groupBy keyspace is ≤ depth·width (fixed), so
    map-side partial aggregation bounds the shuffle at
    depth·width·partitions rows regardless of corpus size or
    vocabulary.  Zero Python in the pipeline.
    """
    # The md5 digest appears in all `depth` slice expressions; inside
    # ONE projection, whole-stage codegen's subexpression elimination
    # evaluates it once per row.  (The HOF let-binding idiom used by
    # _stacked_buckets was measured SLOWER here: higher-order functions
    # run interpreted, and this fan-out is cheap enough that staying in
    # codegen beats saving the hash — 5.3 s vs 6.3 s at sf10.)
    pairs = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("i"),
                    _cms_bucket(item_col, i, width, salt).alias("col"),
                )
                for i in range(depth)
            ])
        ).alias("x")
    ).select("x.i", "x.col")
    return pairs.groupBy("i", "col").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    cells: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms_v1",
) -> DataFrame:
    """Point-query the sketch: ``est(item) = min_i cells[i][h_i(item)]``.

    ``cells`` is ≤ depth·width rows — broadcast; probing never touches
    the corpus.  Absent cells count 0 (an item hashing to an untouched
    bucket has estimate 0, i.e. provably absent).  Returns
    ``(item, est_cnt)`` with the CMS guarantee true ≤ est ≤ true + εN.
    """
    exploded = probes.select(item_col).distinct().select(
        item_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("i"),
                    _cms_bucket(item_col, i, width, salt).alias("col"),
                )
                for i in range(depth)
            ])
        ).alias("x"),
    ).select(item_col, "x.i", "x.col")
    joined = exploded.join(F.broadcast(cells), ["i", "col"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_cnt")
    )


def heavy_hitters_topk(
    df: DataFrame,
    item_col: str,
    k_counters: int,
    topk: int,
    exactness: str | None = None,
) -> DataFrame:
    """Exact top-``topk`` items via MG candidates + exact recount.

    Returns ``(item, cnt, rank)`` ordered by count desc, item asc —
    EXACT whenever the true topk-th count exceeds N/(k_counters+1)
    (the MG survival threshold; callers size ``k_counters`` off the
    expected skew).  The recount is a broadcast semi-join + hash
    aggregate: shuffle volume ∝ candidates × partitions.  The final
    ordering is a TakeOrdered (per-partition top-k, driver merge of
    topk·partitions rows), never a global sort.

    ``exactness`` makes the MG guarantee RUNTIME-VERIFIED instead of
    config-trusted (VERDICT r6 weak #2 — an undersized ``k_counters``
    on a novel corpus must not silently return an approximate top-k):

    - ``"column"``: append ``is_exact`` — per-entry, true iff
      ``cnt·(k_counters+1) > N`` (evaluated overflow-free as
      ``cnt > N div (k_counters+1)``, an equivalent integer predicate).
      A true flag is a PROOF for that entry: every item truly heavier
      sits above the threshold, hence survived to candidacy, was
      recounted exactly, and ranks above it — so (item, cnt, rank) are
      all exact.  A false flag means the guarantee does not cover the
      entry (an unseen item ≤ N/(k+1) could outrank it); the answer
      may still be exact (e.g. no partition ever evicted), but that
      cannot be certified from one pass, so the flag is conservative.
    - ``"raise"``: same predicate folded into the plan as a
      ``raise_error`` — the job FAILS if any returned entry is
      uncertified, for pipelines that must never emit approximations.

    N is recovered from per-partition sentinel totals emitted by the
    candidate pass itself (:func:`mg_candidates`
    ``emit_partition_totals``) — still two corpus scans, zero extra
    passes; the ≤ P sentinel rows ride the same candidate relation.
    NULL items are excluded from counting (``value_counts`` semantics)
    but do inflate N, keeping the threshold conservative.

    Both checks certify RETURNED rows: when aggressive eviction leaves
    fewer than ``topk`` candidates the result is SHORT, not padded —
    callers that require exactly ``topk`` certified ranks should also
    assert the row count.
    """
    from ..plans import ensure_parallelism

    if exactness not in (None, "column", "raise"):
        raise ValueError(f"exactness must be None|'column'|'raise': {exactness}")

    raw = mg_candidates(
        df, item_col, k_counters, emit_partition_totals=exactness is not None
    )
    if exactness is not None:
        # the candidate relation feeds TWO branches (candidates + the
        # sentinel N-total); without a persist each branch re-runs the
        # corpus-wide MG fold (measured +0.6 s at sf0.1 — a third
        # corpus pass).  The relation is ≤ (k+1)·P rows — cache-sized
        # at any corpus (MEMORY_AND_DISK spills if a 1000-partition
        # k=131072 run ever outgrows executor memory).  Session-
        # lifetime by necessity (the returned plan is lazy); drained by
        # caching.clear_query_caches — the one cache policy.
        from ..caching import persisted_for_session

        raw = persisted_for_session(raw, "heavy_hitters_candidates")
    cands = (
        raw.filter(F.col(item_col).isNotNull()).select(item_col).distinct()
    )
    exact = (
        ensure_parallelism(df.select(item_col))
        .join(F.broadcast(cands), on=item_col, how="left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = exact.orderBy(F.desc("cnt"), F.asc(item_col)).limit(topk)
    # Rank assignment runs on ≤ topk rows — single tiny partition.
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("cnt"), F.asc(item_col))
    top = top.withColumn("rank", F.row_number().over(w).cast("long"))
    if exactness is None:
        return top

    totals = raw.filter(F.col(item_col).isNull()).agg(
        F.coalesce(F.sum("lower_bound"), F.lit(0)).alias("__n_total")
    )
    # one-row relation broadcast onto ≤ topk rows
    top = top.crossJoin(F.broadcast(totals))
    certified = F.col("cnt") > F.expr(f"__n_total div {k_counters + 1}")
    if exactness == "raise":
        check = F.when(certified, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "heavy_hitters_topk: MG guarantee not met for item "
                    ),
                    F.col(item_col),
                    F.lit(
                        f" (cnt <= N/(k_counters+1) with k_counters="
                        f"{k_counters}); raise k_counters or accept "
                        "approximate results via exactness='column'"
                    ),
                )
            )
        )
        return top.withColumn("__chk", check).filter("__chk").drop(
            "__chk", "__n_total"
        )
    return top.withColumn("is_exact", certified).drop("__n_total")


# -- KMV / bottom-k distinct sketches (corpus overlap estimation) -----------


def kmv_hash(item, salt: str = "kmv_v1"):
    """Deterministic 52-bit hash value for KMV sketches: the first 13
    hex chars of md5(salt|item) as a BIGINT in [0, 2^52) — the same
    below-the-mantissa trick as :func:`sampling.hash_uniform`, kept as
    an INTEGER so sketch membership compares exactly in any engine."""
    col = F.col(item) if isinstance(item, str) else item
    s = F.concat(F.lit(f"{salt}|"), col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 13), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    item_col: str,
    k: int,
    salt: str = "kmv_v1",
) -> DataFrame:
    """Bottom-k sketch of a column's DISTINCT values (Beyer et al. 2007
    "On synopses for distinct-value estimation"; the KMV / theta-sketch
    family): the ``k`` smallest distinct 52-bit hash values, as a
    ``(hv long)`` relation.

    This is the 100 TB answer to "how big is this corpus's vocabulary /
    how much does corpus A overlap corpus B" when exact distinct
    aggregation would shuffle vocabulary-cardinality data: the sketch
    is O(k), MERGEABLE (sketch of a union = bottom-k of the sketches'
    union — roll up across days/shards by re-folding), and supports
    distinct-count, Jaccard-overlap and intersection estimation with
    relative error ~1/sqrt(k).

    Determinism: the hash is a pure function of (salt, item), so the
    sketch is a set — identical under repartitioning, retries, and
    engines (DuckDB rebuilds it bit-for-bit; the catalog oracle IS the
    engine-swap test).

    Scale shape: one Arrow ``mapInPandas`` pass keeps the k smallest
    DISTINCT hashes per partition (bounded memory, zero shuffle —
    lossless: a global bottom-k hash is necessarily in its partition's
    bottom-k), then the global bottom-k reduces ≤ k·P candidate rows.
    The corpus itself is never shuffled.
    """
    from collections.abc import Iterator

    import pandas as pd

    from ..plans import ensure_parallelism

    # NULL items hash to NULL: drop them BEFORE the fold — a sketch is
    # a set of hash VALUES, and a surviving NaN row would inflate
    # n_seen in kmv_distinct_estimate (count counts it, max ignores
    # it), skewing the below-k exact count (ADVICE r7 #2).
    hv_df = df.select(kmv_hash(item_col, salt).alias("hv")).filter(
        F.col("hv").isNotNull()
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat((acc, pdf))
            acc = acc.drop_duplicates("hv").nsmallest(k, "hv")
        yield acc if acc is not None else pd.DataFrame({"hv": []}).astype(
            {"hv": "int64"}
        )

    reduced = ensure_parallelism(hv_df).mapInPandas(fold, schema="hv long")
    return reduced.dropDuplicates(["hv"]).orderBy("hv").limit(k)


def kmv_merge(*sketches: DataFrame, k: int) -> DataFrame:
    """Fold bottom-k sketches into the sketch of the UNION of their
    corpora: bottom-k of the sketches' union — the mergeability that
    makes KMV the 100 TB rollup shape (Beyer et al. 2007 §3; Agarwal
    et al. 2013 "Mergeable summaries").  Exact identity, not an
    approximation: a hash in bottom-k(A∪B) is in bottom-k(A) or
    bottom-k(B), so merging per-day/per-shard sketches (incrementally,
    in any order, any grouping) yields BIT-FOR-BIT the sketch a
    from-scratch pass over the concatenated corpora builds.  Runs on
    ≤ k·len(sketches) rows — history is never rescanned."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    merged = sketches[0].select("hv")
    for s in sketches[1:]:
        merged = merged.unionAll(s.select("hv"))
    return merged.dropDuplicates(["hv"]).orderBy("hv").limit(k)


def kmv_distinct_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """Distinct-count estimate from a bottom-k sketch: when the sketch
    holds fewer than ``k`` hashes the count is EXACT (every distinct
    value is in the sketch — ``is_exact`` true); otherwise
    D̂ = (k−1) / U_(k) with U_(k) = (kth smallest hash + 1) / 2^52 —
    the standard KMV estimator, a single double expression over exact
    integers (bit-identical in any engine).  Returns one row
    ``(n_seen, est_distinct, is_exact)``."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("hv").alias("mx")
    )
    exact = F.col("n_seen") < k
    est = F.when(exact, F.col("n_seen").cast("double")).otherwise(
        F.lit(float(k - 1))
        * F.lit(float(1 << 52))
        / (F.col("mx").cast("double") + F.lit(1.0))
    )
    return agg.select(
        F.col("n_seen").cast("long").alias("n_seen"),
        est.alias("est_distinct"),
        exact.alias("is_exact"),
    )


def kmv_overlap_estimate(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int
) -> DataFrame:
    """Jaccard / intersection / union estimates between two corpora
    from their bottom-k sketches alone (never the corpora): take the
    bottom-k of the sketch UNION; the fraction of those hashes present
    in BOTH sketches estimates Jaccard (a hash in bottom-k(A∪B) that
    belongs to A is necessarily in bottom-k(A), so sketch membership
    is exact set membership for these rows), and the union's kth value
    estimates |A∪B| by KMV.  Returns one row ``(k_used, est_jaccard,
    est_union, est_intersection)``; all estimates are exact when the
    union sketch is not full.  Everything runs on ≤ 2k rows."""
    a = sketch_a.select("hv").withColumn("ina", F.lit(1)).withColumn(
        "inb", F.lit(0)
    )
    b = sketch_b.select("hv").withColumn("ina", F.lit(0)).withColumn(
        "inb", F.lit(1)
    )
    merged = (
        a.unionAll(b)
        .groupBy("hv")
        .agg(F.max("ina").alias("ina"), F.max("inb").alias("inb"))
        .orderBy("hv")
        .limit(k)
    )
    agg = merged.agg(
        F.count(F.lit(1)).alias("ku"),
        F.sum(F.col("ina") * F.col("inb")).alias("nboth"),
        F.max("hv").alias("mx"),
    )
    exact = F.col("ku") < k
    est_union = F.when(exact, F.col("ku").cast("double")).otherwise(
        F.lit(float(k - 1))
        * F.lit(float(1 << 52))
        / (F.col("mx").cast("double") + F.lit(1.0))
    )
    jac = F.col("nboth").cast("double") / F.col("ku").cast("double")
    return agg.select(
        F.col("ku").cast("long").alias("k_used"),
        jac.alias("est_jaccard"),
        est_union.alias("est_union"),
        (jac * est_union).alias("est_intersection"),
    )


def kmv_sketch_per_group(
    df: DataFrame,
    item_col: str,
    group_col: str,
    k: int,
    salt: str = "kmv_v1",
) -> DataFrame:
    """Bottom-k sketch per group in ONE corpus pass — the input to an
    overlap MATRIX ("how much vocabulary do these languages/sources/
    shards share"), computed without ever joining the corpora.

    Same lossless two-level reduction as :func:`kmv_sketch`: an Arrow
    fold keeps the k smallest distinct hashes per (group, partition) —
    memory O(k·groups + batch), zero shuffle — then an exact window
    over ≤ k·groups·partitions rows takes each group's global bottom-k.
    Returns ``(group_col, hv)``.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.window import Window

    from ..plans import ensure_parallelism

    # NULL items → NULL hash: dropped before the fold (same ADVICE r7
    # #2 rationale as kmv_sketch); a NULL GROUP is kept — it is a group.
    hv_df = df.select(
        F.col(group_col), kmv_hash(item_col, salt).alias("hv")
    ).filter(F.col("hv").isNotNull())

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat((acc, pdf))
            acc = (
                acc.drop_duplicates([group_col, "hv"])
                .sort_values("hv")
                # dropna=False: a NULL group is a group (window parity)
                .groupby(group_col, sort=False, dropna=False)
                .head(k)
            )
        yield acc if acc is not None else pd.DataFrame(
            {group_col: pd.array([], dtype=object), "hv": []}
        ).astype({"hv": "int64"})

    reduced = (
        ensure_parallelism(hv_df)
        .mapInPandas(fold, schema=f"{group_col} string, hv long")
        .dropDuplicates([group_col, "hv"])
    )
    w = Window.partitionBy(group_col).orderBy("hv")
    return (
        reduced.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(group_col, "hv")
    )


def kmv_overlap_matrix(
    sketches: DataFrame,
    group_col: str,
    k: int,
) -> DataFrame:
    """Pairwise overlap estimates between every pair of groups from
    their bottom-k sketches (``(group, hv)`` relation, e.g. from
    :func:`kmv_sketch_per_group`): for each unordered pair the union's
    bottom-k is taken and the fraction present in both sketches
    estimates Jaccard — all on the sketch relation (≤ k·G rows), the
    corpora are never touched.  Returns
    ``(g_a, g_b, k_used, est_jaccard, est_union, est_intersection)``
    for g_a < g_b.

    NULL groups are EXCLUDED from the matrix, explicitly (ADVICE r7
    #3): :func:`kmv_sketch_per_group` preserves a NULL group as a
    group, but an unordered-pair matrix needs a total order on group
    labels and ``NULL < x`` is not a truth value — rather than invent a
    sentinel ordering (which could collide with a real label), the
    NULL group's sketch is still available in the input relation for a
    caller to compare via :func:`kmv_overlap_estimate` directly."""
    from pyspark.sql.window import Window

    sketches = sketches.filter(F.col(group_col).isNotNull())
    groups = sketches.select(F.col(group_col).alias("g")).distinct()
    pairs = (
        groups.select(F.col("g").alias("g_a"))
        .crossJoin(groups.select(F.col("g").alias("g_b")))
        .filter(F.col("g_a") < F.col("g_b"))
    )
    side_a = pairs.join(
        sketches.select(F.col(group_col).alias("g_a"), "hv"), "g_a"
    ).select("g_a", "g_b", "hv", F.lit(1).alias("ina"), F.lit(0).alias("inb"))
    side_b = pairs.join(
        sketches.select(F.col(group_col).alias("g_b"), "hv"), "g_b"
    ).select("g_a", "g_b", "hv", F.lit(0).alias("ina"), F.lit(1).alias("inb"))
    merged = (
        side_a.unionAll(side_b)
        .groupBy("g_a", "g_b", "hv")
        .agg(F.max("ina").alias("ina"), F.max("inb").alias("inb"))
    )
    w = Window.partitionBy("g_a", "g_b").orderBy("hv")
    bott = merged.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = bott.groupBy("g_a", "g_b").agg(
        F.count(F.lit(1)).alias("ku"),
        F.sum(F.col("ina") * F.col("inb")).alias("nboth"),
        F.max("hv").alias("mx"),
    )
    exact = F.col("ku") < k
    est_union = F.when(exact, F.col("ku").cast("double")).otherwise(
        F.lit(float(k - 1))
        * F.lit(float(1 << 52))
        / (F.col("mx").cast("double") + F.lit(1.0))
    )
    jac = F.col("nboth").cast("double") / F.col("ku").cast("double")
    return agg.select(
        "g_a", "g_b",
        F.col("ku").cast("long").alias("k_used"),
        jac.alias("est_jaccard"),
        est_union.alias("est_union"),
        (jac * est_union).alias("est_intersection"),
    )

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
   (checked by :func:`heavy_hitters_topk` when ``check_guarantee``).

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


def _mg_update(counters: dict, base: list, item: str, w: int, k: int) -> None:
    """Weighted Misra-Gries insert with the lazy-decrement offset trick.

    ``counters[item] - base[0]`` is the live residual.  A global
    decrement of ``d`` is ``base[0] += d`` (O(1)); dead entries
    (residual ≤ 0) are evicted lazily when the table is full, which
    amortizes the O(k) sweep against the ≥1 slot it frees.
    """
    if item in counters:
        counters[item] += w
        return
    if len(counters) < k:
        counters[item] = base[0] + w
        return
    # Table full: decrement all by d = min(w, current minimum residual).
    m = min(counters.values()) - base[0]
    d = w if w < m else m
    base[0] += d
    w -= d
    if w > 0:
        # The old minimum's residual is now 0 — evict dead entries
        # (frees ≥1 slot) and insert the remainder.
        dead = [it for it, v in counters.items() if v <= base[0]]
        for it in dead:
            del counters[it]
        counters[item] = base[0] + w


def mg_candidates(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries → candidate relation.

    Zero shuffle: one ``mapInPandas`` pass over the input partitions;
    each partition emits at most ``k`` rows ``(item, lower_bound)``
    where ``lower_bound`` is the MG residual (≤ true partition count,
    and ≥ true − n_p/(k+1)).  Arrow batches are pre-reduced with
    ``value_counts`` so the Python dict sees one weighted insert per
    distinct item per batch, not one per row.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        base = [0]
        for pdf in batches:
            for item, w in pdf[item_col].value_counts().items():
                _mg_update(counters, base, item, int(w), k)
        items = [
            (it, v - base[0]) for it, v in counters.items() if v > base[0]
        ]
        yield pd.DataFrame(items, columns=[item_col, "lower_bound"])

    out_schema = f"{item_col} string, lower_bound long"
    return df.select(item_col).mapInPandas(run, schema=out_schema)


def heavy_hitters_topk(
    df: DataFrame,
    item_col: str,
    k_counters: int,
    topk: int,
) -> DataFrame:
    """Exact top-``topk`` items via MG candidates + exact recount.

    Returns ``(item, cnt, rank)`` ordered by count desc, item asc —
    EXACT whenever the true topk-th count exceeds N/(k_counters+1)
    (the MG survival threshold; callers size ``k_counters`` off the
    expected skew).  The recount is a broadcast semi-join + hash
    aggregate: shuffle volume ∝ candidates × partitions.  The final
    ordering is a TakeOrdered (per-partition top-k, driver merge of
    topk·partitions rows), never a global sort.
    """
    cands = mg_candidates(df, item_col, k_counters).select(item_col).distinct()
    exact = (
        df.join(F.broadcast(cands), on=item_col, how="left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = exact.orderBy(F.desc("cnt"), F.asc(item_col)).limit(topk)
    # Rank assignment runs on ≤ topk rows — single tiny partition.
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("cnt"), F.asc(item_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))

"""Distributed regression via mergeable sufficient statistics.

The 100 TB problem: fitting ``y = a + b·x`` (per group — per language,
per source, per time bucket) over a corpus too large to collect.  OLS
needs only five sufficient statistics per group::

    n, Σx, Σy, Σxy, Σx², (Σy² for R²)

all of which are plain sums — Spark computes them with ONE map-side
partially-aggregated ``groupBy``; the closed-form solve runs on the
k-group result relation (never the data).  This is the mergeable-
summaries shape (like the HLL / quantile-histogram rollups in
``queries_scale``): per-partition partials add associatively, so the
same statistics roll up across files, days, or clusters without a
second corpus pass.

Determinism contract: when ``x`` and ``y`` are integer-valued (token
counts, byte lengths, ×1000-grid-quantized reals — the
``embed_kmeans_lloyd`` trick), the sums are EXACT BIGINTs in any
engine; slope/intercept/R² are then single IEEE754 double expressions
over exact integers and reproduce bit-for-bit in Spark and DuckDB.
Float inputs would make Σ order-dependent; callers quantize first.

Reference scope parity: the reference engine delegates dataframe
analytics to pandas on the collected database (psweep manual's
"post-processing is plain pandas" stance); this module is that
post-processing step re-expressed as a distributed one-pass aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ols_sufficient_stats(
    df: DataFrame,
    x_col: str | Column,
    y_col: str | Column,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group OLS sufficient statistics in one shuffle.

    ``x``/``y`` are cast to BIGINT (callers pre-quantize reals onto an
    integer grid so the sums are exact).  Output columns:
    ``n, sx, sy, sxy, sxx, syy`` — all BIGINT, all exact, all
    associative (mergeable across incremental runs by addition).
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("long")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("long")
    gb = df.groupBy(*(group_cols or []))
    return gb.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )


def ols_fit(
    df: DataFrame,
    x_col: str | Column,
    y_col: str | Column,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Closed-form simple OLS per group: slope, intercept, R².

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    intercept = (Σy − slope·Σx) / n
    R²        = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    The covariance/variance terms are computed EXACTLY in
    DECIMAL(38,0) (each factor is a BIGINT ≤ 2⁶³−1, so every product
    n·Σxy etc. is < 8.6e37 and always fits 38 digits — BIGINT
    arithmetic would silently wrap above 2⁶³ ≈ 9.2e18, which a mere
    1e6 rows of 1e10-magnitude per-row products already exceeds), then
    cast to DOUBLE for the final divisions — the identical expression
    (HUGEINT in DuckDB) evaluates bit-for-bit, which is how the
    catalog oracle verifies it.  The caller-side exactness contract is
    therefore only that the six SUMS fit BIGINT (quantize so that
    Σ|x·y| < 2⁶³); the solve never wraps.  The one remaining edge —
    |n·Σxy − Σx·Σy| ≥ 1e38, reachable only when both products exceed
    5e37, i.e. sums within ~25% of the BIGINT limit — yields NULL
    (Spark decimal overflow), never a wrong number.  Degenerate groups
    (zero x-variance) return NULL slope/intercept/R² rather than ±inf.

    Scale shape: ONE partially-aggregated shuffle of 6 longs per
    (group × partition); the solve is a projection over k group rows.
    """
    return ols_fit_from_stats(
        ols_sufficient_stats(df, x_col, y_col, group_cols),
        group_cols or [],
    )


def ols_fit_from_stats(stats: DataFrame, group_cols: list[str]) -> DataFrame:
    """Solve from PRE-AGGREGATED statistics (e.g. unioned increments
    rolled up by addition) — the mergeable path: callers sum the six
    stat columns across increments with ``groupBy(group).sum(...)``
    and hand the result here; no corpus re-scan."""
    s = stats

    # Cross terms in DECIMAL, not BIGINT: each factor fits 19 digits
    # (BIGINT), so products are exact DECIMAL(38,0) — BIGINT products
    # would silently wrap at 2^63 with ANSI off (DuckDB raises; Spark
    # would diverge).  See ols_fit's exactness contract.
    def _d(c: Column) -> Column:
        return c.cast("decimal(19,0)")

    cov = _d(s.n) * _d(s.sxy) - _d(s.sx) * _d(s.sy)
    varx = _d(s.n) * _d(s.sxx) - _d(s.sx) * _d(s.sx)
    vary = _d(s.n) * _d(s.syy) - _d(s.sy) * _d(s.sy)
    slope = F.when(varx != 0, cov.cast("double") / varx.cast("double"))
    intercept = (
        s.sy.cast("double") - slope * s.sx.cast("double")
    ) / s.n.cast("double")
    r2 = F.when(
        (varx != 0) & (vary != 0),
        (cov.cast("double") * cov.cast("double"))
        / (varx.cast("double") * vary.cast("double")),
    )
    return s.select(
        *group_cols,
        s.n.cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )

"""Deterministic hash-based sampling — the reproducible alternative to
``DataFrame.sample``.

``sample()``/``sampleBy()`` draw from a per-partition RNG: the kept set
changes with partitioning, retries, and engine — unusable when a 100 TB
corpus is sampled incrementally (new files arrive, old decisions must
not flip) or when two systems must agree on the sample.  Hash sampling
fixes the decision per KEY: keep iff ``bucket(key) < rate·B`` where
``bucket = int(md5(key)[:15 hex]) mod B`` — stable under repartition,
re-runs, engine swaps (md5 is md5 everywhere), and growable (raising
the rate strictly grows the kept set, so a 1% sample is a subset of the
10% sample — nested samples for scaling-law curves for free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from md5 of the (salted) key string.
    15 hex chars = 60 bits — parses exactly into a long in any engine."""
    s = F.concat(F.lit(salt), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % BUCKETS


def sample_by_hash(
    df: DataFrame,
    key_col: str,
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Keep each row iff its key hashes below ``rate`` — deterministic,
    repartition-proof, nested across rates. ``salt`` derives
    independent samples from the same keys (e.g. train/holdout)."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(rate * BUCKETS))


def stratified_sample_by_hash(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. upsample rare languages,
    downsample crawl dumps). One map-side filter, zero shuffle."""
    b = hash_bucket(F.col(key_col), salt)
    thresh = None
    for k, r in rates.items():
        cond = F.when(F.col(strata_col) == k, F.lit(int(r * BUCKETS)))
        thresh = cond if thresh is None else thresh.when(
            F.col(strata_col) == k, F.lit(int(r * BUCKETS))
        )
    thresh = (
        F.lit(int(default_rate * BUCKETS))
        if thresh is None
        else thresh.otherwise(F.lit(int(default_rate * BUCKETS)))
    )
    return df.filter(b < thresh)

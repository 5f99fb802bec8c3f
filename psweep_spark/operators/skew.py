"""Skew-resilient equi-join: salting for hot keys.

A shuffle join keyed on a skewed column puts every row of a hot key in
ONE reducer task — at 100 TB a single hot user/order key can hold a
1000-executor cluster hostage to one straggler. AQE's skew-join split
(``spark.sql.adaptive.skewJoin``) handles sort-merge cases adaptively;
this operator is the *explicit* form for when the build side is too big
to broadcast but small enough to replicate ``salt_factor`` times —
e.g. fact ⋈ mid-sized dimension on a power-law key.

Mechanics (classic salting, public pattern — cf. Spark AQE's
OptimizeSkewedJoin which splits partitions the same way):

* probe (big, skewed) side: add ``_salt = pmod(xxhash64(whole row),
  n)`` — deterministic per row (safe under task retries, unlike
  ``rand()``), uniform across salts.
* build side: explode each row into ``n`` copies, one per salt value.
* join on ``(key, _salt)`` — each hot key now spreads over ``n``
  reducer tasks; result equals the unsalted join exactly.

The reference engine (single-process pandas) has no analogue; this is
BASELINE north-star scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt_factor: int = 16,
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on ``on``, spreading each join key
    over ``salt_factor`` reducer tasks.

    ``probe`` is the large skewed side (salted once per row); ``build``
    is replicated ``salt_factor``× — its shuffled size grows by that
    factor, so pick the side to replicate accordingly. Supported
    ``how``: inner / left / left_semi (the probe side survives)."""
    if how not in ("inner", "left", "left_semi"):
        raise ValueError(f"salted_join does not support how={how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    probe_s = probe.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]),
               F.lit(salt_factor)).cast("int"),
    )
    build_s = build.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))),
    )
    joined = probe_s.join(build_s, keys + [SALT_COL], how)
    return joined.drop(SALT_COL)

"""Database query / projection / extraction operators — SURVEY §2.3, M4.

All pure DataFrame compositions; Catalyst handles predicate pushdown,
column pruning and constant folding (SURVEY §4).  The full Spark SQL
surface composes with these (the reference delegates post-processing to
"pandas Ninja skills", manual.md:820-823 — here that's `spark.sql`).
"""

from __future__ import annotations

import functools
import operator
import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import col_kind, filter_cols

__all__ = [
    "df_filter_conds",
    "df_print",
    "df_extract_dicts",
    "df_extract_params",
    "df_extract_row",
    "df_extract_pset",
    "check_calc_dir",
    "df_to_json",
    "df_to_table",
    "latest_per_pset",
    "failed_psets",
]

_OPS = {
    "and": operator.and_,
    "or": operator.or_,
    # Column has no __xor__; boolean xor == inequality
    "xor": lambda a, b: a != b,
}


def df_filter_conds(
    df: DataFrame, conds: Sequence[Column], op: str = "and"
) -> DataFrame:
    """Fuse N boolean Columns with and/or/xor and filter
    (reference df_filter_conds, psweep.py:622-679).

    Catalyst folds the fused conjunction into the scan predicate.
    """
    conds = list(conds)
    if not conds:
        return df
    if op not in _OPS:
        raise ValueError(f"op must be one of {sorted(_OPS)}, got {op!r}")
    return df.filter(functools.reduce(_OPS[op], conds))


def df_print(
    df: DataFrame,
    *,
    index: bool = False,
    prefix_cols: bool = False,
    cols: Sequence[str] = (),
    skip_cols: Sequence[str] = (),
    n: int = 20,
    truncate: bool = False,
) -> None:
    """Project + pretty-print with sorted column names; drops ``_prefix``
    bookkeeping columns by default (reference df_print, psweep.py:515-619).

    ``index=True`` reproduces the reference's pandas layout: the frame
    prints via ``to_string`` with ``_pset_seq`` as the (unnamed) index —
    the reference's DataFrame index IS its pset seq, so this is exact
    display parity.  Spark rows have no positional index, hence the
    seq column stands in; rows without ``_pset_seq`` fall back to a
    0..n-1 collect order index.  Driver-side by definition (bounded by
    ``n``), like every print."""
    names = list(df.columns)
    if cols:
        sel = [c for c in names if c in set(cols)]
    else:
        sel = names if prefix_cols else [
            c for c in names if col_kind(c) != "prefix"
        ]
    sel = [c for c in sel if c not in set(skip_cols)]
    if "_pset_seq" in df.columns:
        df = df.orderBy("_pset_seq")
    if index:
        proj = sorted(sel)
        grab = proj + (
            ["_pset_seq"] if "_pset_seq" in df.columns and
            "_pset_seq" not in proj else []
        )
        pdf = df.select(*grab).limit(n).toPandas()
        if "_pset_seq" in df.columns:
            pdf.index = pdf["_pset_seq"].to_numpy()
            pdf = pdf[proj]
        print(pdf.to_string(index=True))
        return
    df.select(*sorted(sel)).show(n=n, truncate=truncate)


def df_extract_dicts(df: DataFrame, order: bool = True) -> list[dict]:
    """DB → list of row dicts (reference df_extract_dicts,
    psweep.py:713-752).  Driver-side by definition; order by _pset_seq
    to reproduce the reference's index order."""
    if order and "_pset_seq" in df.columns:
        df = df.orderBy("_pset_seq")
    from .objects import maybe_unpickle, pickled_cols

    # unpickle ONLY columns marked as pickled-object storage in their
    # field metadata — sniffing the MAGIC prefix on every binary cell
    # would (a) run cloudpickle.loads on attacker-controlled bytes from
    # databases that never opted into pickle_objects, and (b) silently
    # transform a user bytes param that legitimately starts with MAGIC
    pcols = pickled_cols(df.schema)
    return [
        {
            k: (maybe_unpickle(v) if k in pcols else v)
            for k, v in r.asDict(recursive=True).items()
        }
        for r in df.collect()
    ]


def df_extract_params(df: DataFrame, order: bool = True) -> list[dict]:
    """DB → the original params (pset columns only; hashes round-trip)
    (reference psweep.py:755-795) — feeds study chaining."""
    return df_extract_dicts(df.select(*filter_cols(df.columns)), order=False) if not (
        order and "_pset_seq" in df.columns
    ) else [
        {k: v for k, v in d.items() if col_kind(k) == "pset"}
        for d in df_extract_dicts(df, order=True)
    ]


def df_extract_row(df: DataFrame, pset_id: str, kind: str | None = None) -> dict:
    """Point lookup by ``_pset_id``; asserts uniqueness (psweep.py:798-831)."""
    rows = df.filter(F.col("_pset_id") == pset_id).collect()
    if len(rows) != 1:
        raise ValueError(
            f"_pset_id {pset_id!r} matches {len(rows)} rows, expected exactly 1"
        )
    from .objects import maybe_unpickle, pickled_cols

    # metadata-gated unpickling — same rationale as df_extract_dicts
    pcols = pickled_cols(df.schema)
    d = {
        k: (maybe_unpickle(v) if k in pcols else v)
        for k, v in rows[0].asDict(recursive=True).items()
    }
    if kind is not None:
        d = {k: v for k, v in d.items() if col_kind(k) == kind}
    return d


def df_extract_pset(df: DataFrame, pset_id: str) -> dict:
    """The pset-column projection of one row (psweep.py:834-850)."""
    return df_extract_row(df, pset_id, kind="pset")


def check_calc_dir(calc_dir: str, df: DataFrame) -> dict:
    """Reconcile DB pset_ids vs pset-id-named dirs on disk
    (reference psweep.py:273-297): {'db_not_disk', 'disk_not_db'}."""
    disk = {
        e
        for e in (os.listdir(calc_dir) if os.path.isdir(calc_dir) else [])
        if os.path.isdir(os.path.join(calc_dir, e)) and _looks_like_uuid(e)
    }
    db = {r["_pset_id"] for r in df.select("_pset_id").distinct().collect()}
    return {"db_not_disk": sorted(db - disk), "disk_not_db": sorted(disk - db)}


def _looks_like_uuid(s: str) -> bool:
    parts = s.split("-")
    return len(parts) == 5 and tuple(map(len, parts)) == (8, 4, 4, 4, 12)


# -- sinks (reference bin/psweep-db2json, bin/psweep-db2table) ---------------


def df_to_json(
    df: DataFrame,
    path: str | None = None,
    order: bool = True,
    orient: str = "records",
):
    """DB → JSON (reference psweep-db2json, ``bin/psweep-db2json:13-16,
    48-51``: every pandas ``to_json`` orient).

    ``orient="records"`` is the scale path: JSON **lines** (one doc per
    row — jq-friendly, and with ``path`` a distributed per-partition
    write, never a driver collect).  The other orients
    (split/index/columns/values) are whole-frame layouts that are only
    meaningful as one document, so they take the driver-side pandas
    export path — right for the small query/export DBs they serve, by
    design not for 100 TB.  Returns a list of lines (records, no
    path), a single JSON string (other orients, no path), or None
    (written to ``path``)."""
    if order and "_pset_seq" in df.columns:
        df = df.orderBy("_pset_seq")
    if orient == "records":
        if path is None:
            return df.toJSON().collect()
        df.write.mode("overwrite").json(path)
        return None
    if orient not in ("split", "index", "columns", "values"):
        raise ValueError(
            f"orient must be records|split|index|columns|values, got {orient!r}"
        )
    doc = df.toPandas().to_json(orient=orient, date_format="iso")
    if path is None:
        return doc
    with open(path, "w") as fh:
        fh.write(doc)
    return None


def df_to_table(
    df: DataFrame, *, prefix_cols: bool = False, cols: Sequence[str] = ()
) -> str:
    """DB → text table string (reference psweep-db2table)."""
    names = list(cols) or [
        c for c in df.columns if prefix_cols or col_kind(c) != "prefix"
    ]
    if "_pset_seq" in df.columns:
        df = df.orderBy("_pset_seq")
    return df.select(*sorted(names)).toPandas().to_string(index=False)


# -- composable extras the reference lacks (SURVEY §2.5) ---------------------


def latest_per_pset(df: DataFrame) -> DataFrame:
    """Latest run's row per distinct pset — windowed dedup
    (`row_number over partitionBy(_pset_hash) orderBy desc(_run_seq)`)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("_pset_hash").orderBy(
        F.desc("_run_seq"), F.desc("_pset_seq")
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def failed_psets(df: DataFrame) -> DataFrame:
    """Rows whose latest attempt failed (repeat-failed pattern,
    reference examples/repeat_failed.py:84-101)."""
    if "_failed" not in df.columns:
        raise ValueError("DB has no _failed column (run with safe=True)")
    return latest_per_pset(df).filter(F.col("_failed"))

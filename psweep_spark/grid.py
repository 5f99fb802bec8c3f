"""Param-grid constructors — SURVEY §2.1 operators #1-11 (M2).

Two tiers, same semantics:

* **Eager tier** (`plist`, `pgrid`, `itr2params`, `stargrid`, ...):
  list-of-dicts API with the exact behavior of the reference
  (`/root/reference/src/psweep/psweep.py:906-1183`) — grids are small,
  human-authored, and materializing them early "helps detecting errors
  early" (reference manual.md:314-317).

* **Lazy tier** (`plist_df`, `pgrid_df`, `zip_df`, `stargrid_df`):
  the same constructions as unmaterialized Spark DataFrames — a 10^9-row
  grid is `range` × `crossJoin`, never collected.  This is the 100 TB
  path: Catalyst sees the whole plan (grid → anti-join → run) and can
  prune/push/broadcast across it.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterable, Iterator, Sequence
from io import IOBase
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .hashing import pset_hash

__all__ = [
    "plist",
    "merge_dicts",
    "itr2params",
    "pgrid",
    "stargrid",
    "flatten",
    "flatten_dict",
    "logspace",
    "intspace",
    "filter_params_unique",
    "filter_params_dup_hash",
    "plist_df",
    "pgrid_df",
    "zip_df",
    "stargrid_df",
]


# ---------------------------------------------------------------------------
# helpers (reference psweep.py:106-151)
# ---------------------------------------------------------------------------


def is_seq(seq) -> bool:
    """True for non-string, non-dict, non-file iterables."""
    if isinstance(seq, (str, IOBase, dict)):
        return False
    try:
        iter(seq)
        return True
    except TypeError:
        return False


def flatten(seq) -> Iterator[Any]:
    """Recursively flatten nested sequences (reference psweep.py:121-127)."""
    for item in seq:
        if not is_seq(item):
            yield item
        else:
            yield from flatten(item)


def flatten_dict(dct: dict, join_str: str = "_") -> dict:
    """Flatten nested dict to ``a_b_c``-style keys (psweep.py:130-151).

    >>> flatten_dict(dict(a=1, b=dict(c=2, d={23: 42})))
    {'a': 1, 'b_c': 2, 'b_d_23': 42}
    """

    def _fd(d: dict, key=None):
        for kk, vv in d.items():
            joined = kk if key is None else join_str.join((str(key), str(kk)))
            if isinstance(vv, dict):
                yield from _fd(vv, key=joined)
            else:
                yield joined, vv

    return dict(_fd(dct))


# ---------------------------------------------------------------------------
# eager tier — reference-parity list API
# ---------------------------------------------------------------------------


def plist(name: str, seq: Sequence[Any]) -> list[dict]:
    """One varied parameter → list of single-key dicts (psweep.py:906-913).

    >>> plist('a', [1, 2, 3])
    [{'a': 1}, {'a': 2}, {'a': 3}]
    """
    return [{name: entry} for entry in seq]


def merge_dicts(*args, allow_dup_keys: bool = True) -> dict:
    """Left-to-right dict merge (psweep.py:916-945).

    Accepts dicts as varargs or a single sequence of dicts.
    """
    if len(args) == 1 and is_seq(args[0]):
        args = tuple(args[0])
    l_args = list(args)
    for entry in l_args:
        if not isinstance(entry, dict):
            raise TypeError(f"{entry!r} is no dict")
    if not allow_dup_keys:
        for d1, d2 in itertools.pairwise(set(d.keys()) for d in l_args):
            union = d1 & d2
            if union:
                raise ValueError(f"dict keys overlap: {union}")
    out: dict = {}
    for entry in l_args:
        out.update(entry)
    return out


def itr2params(loops: Iterable[Any]) -> list[dict]:
    """Flatten+merge an iterator of (nested) dict tuples into psets
    (psweep.py:948-999).  Rejects duplicate keys; asserts equal pset
    lengths across the grid.
    """
    ret = [merge_dicts(*flatten([entry]), allow_dup_keys=False) for entry in loops]
    lens = set(map(len, ret))
    if len(lens) > 1:
        raise ValueError(f"not all psets have same length; lengths={sorted(lens)}")
    return ret


def pgrid(*plists) -> list[dict]:
    """Cartesian product of plists, flattened to psets (psweep.py:1002-1051).

    ``pgrid(a, b, c)`` or ``pgrid([a, b, c])``; zipped axes via
    ``pgrid(zip(a, b), c)``.
    """
    if len(plists) == 1 and is_seq(plists[0]):
        plists = tuple(plists[0])
    return itr2params(itertools.product(*plists))


def stargrid(
    const: dict,
    vary: Sequence[Sequence[dict]],
    vary_labels: Sequence[str] | None = None,
    vary_label_col: str = "_vary",
    skip_dups: bool = True,
) -> list[dict]:
    """Star/OFAT pattern around constants (psweep.py:1084-1183)."""
    if vary_labels is not None and len(vary_labels) != len(vary):
        raise ValueError("vary_labels and vary must have same length")
    params = []
    for ii, pl in enumerate(vary):
        for dct in pl:
            if vary_labels is not None:
                dct = merge_dicts(dct, {vary_label_col: vary_labels[ii]})
            params.append(merge_dicts(const, dct))
    if skip_dups:
        try:
            return filter_params_unique(params)
        except (TypeError, ValueError):
            return params
    return params


def logspace(start, stop, num=50, offset=0, log_func=np.log10, **kwds):
    """Log-spaced values with true start/stop bounds and tunable offset
    strength (psweep.py:300-353)."""
    base = kwds.pop("base", 10.0)
    if not np.allclose(log_func(base), 1.0):
        raise ValueError(f"log_func and base={base} don't match")
    return (
        np.logspace(
            log_func(start + offset),
            log_func(stop + offset),
            num=num,
            base=base,
            **kwds,
        )
        - offset
    )


def intspace(*args, dtype=np.int64, **kwds):
    """np.linspace rounded to unique ints (psweep.py:356-368); may return
    fewer than ``num`` points."""
    if "dtype" in kwds:
        raise TypeError("got 'dtype' multiple times")
    return np.unique(np.round(np.linspace(*args, **kwds)).astype(dtype))


def _get_hash(pset: dict) -> str:
    return pset.get("_pset_hash") or pset_hash(pset)


def filter_params_unique(params: Sequence[dict]) -> list[dict]:
    """Dedup psets by hash, keep first occurrence in order
    (psweep.py:1054-1065)."""
    seen: set[str] = set()
    out = []
    for pset in params:
        h = _get_hash(pset)
        if h not in seen:
            seen.add(h)
            out.append(pset)
    return out


def filter_params_dup_hash(
    params: Sequence[dict], hashes: Iterable[str]
) -> list[dict]:
    """Remove psets whose hash ∈ ``hashes`` (psweep.py:1068-1081)."""
    hs = set(hashes)
    return [pset for pset in params if _get_hash(pset) not in hs]


# ---------------------------------------------------------------------------
# lazy tier — DataFrame grid builders (the 100 TB path)
# ---------------------------------------------------------------------------


def plist_df(spark: SparkSession, name: str, seq: Sequence[Any]) -> DataFrame:
    """Single-axis grid as a one-column DataFrame.

    Axes are tiny, human-authored lists → one partition.  Without the
    coalesce, ``createDataFrame`` splits N values across
    ``defaultParallelism`` partitions and a 3-axis cross product
    explodes to 32^3 = 32768 tasks for a 24-row grid.
    """
    return spark.createDataFrame([(v,) for v in seq], [name]).coalesce(1)


def pgrid_df(*dfs: DataFrame) -> DataFrame:
    """Cartesian product of axis DataFrames via chained crossJoin.

    Catalyst plans this as `BroadcastNestedLoopJoin` over tiny axis
    relations — the product is never materialized driver-side, so a
    10^9-row grid stays a lazy plan.  Duplicate column names are
    rejected at plan build (reference parity: itr2params dup-key check).
    """
    seen: set[str] = set()
    for df in dfs:
        for c in df.columns:
            if c in seen:
                raise ValueError(f"dict keys overlap: {{{c!r}}}")
            seen.add(c)
    out = dfs[0]
    for df in dfs[1:]:
        # Broadcast the new axis: the running product keeps its
        # partitioning (BroadcastNestedLoopJoin), so a 10^9-row grid
        # built from `spark.range` axes parallelizes over the stream
        # side without a partition-count explosion.
        out = out.crossJoin(F.broadcast(df))
    return out


def zip_df(*dfs: DataFrame) -> DataFrame:
    """Co-vary axes positionally (reference ``zip(a, b)`` inside pgrid).

    Implemented as an equi-join on ``row_number``.  NOTE: the global
    Window (no partition) is intentional — zipped axes are tiny,
    human-authored lists; for huge generated axes use ``spark.range``
    and derive all co-varying columns from the same index instead.
    """
    w = Window.orderBy(F.monotonically_increasing_id())
    out = None
    for df in dfs:
        d = df.withColumn("__pos", F.row_number().over(w))
        out = d if out is None else out.join(d, "__pos", "inner")
    assert out is not None
    return out.drop("__pos")


def stargrid_df(
    spark: SparkSession,
    const: dict,
    vary: Sequence[DataFrame],
    vary_labels: Sequence[str] | None = None,
    vary_label_col: str = "_vary",
) -> DataFrame:
    """Star pattern as unionByName of per-axis DataFrames with constant
    back-fill; dedup left to the caller (hash column + dropDuplicates)."""
    if vary_labels is not None and len(vary_labels) != len(vary):
        raise ValueError("vary_labels and vary must have same length")
    outs = []
    for ii, df in enumerate(vary):
        for k, v in const.items():
            if k not in df.columns:
                df = df.withColumn(k, F.lit(v))
        if vary_labels is not None:
            df = df.withColumn(vary_label_col, F.lit(vary_labels[ii]))
        outs.append(df)
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out

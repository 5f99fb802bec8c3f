"""Randomized equivalence testing for the custom join operators —
the operators Spark's DataFrame API lacks, checked against independent
reference implementations (pandas merge_asof; brute-force interval
containment) over seeded random inputs.  Complements the fixed-fixture
oracles: random keys/timestamps/tolerances explore the edge lattice
(equal timestamps, empty groups, out-of-tolerance gaps, interval
boundaries) far more densely than hand-written cases."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from psweep_spark.operators.asof import asof_join
from psweep_spark.operators.rangejoin import range_join_bucketed

EPOCH = dt.datetime(2024, 1, 1)


def _ts(us: int) -> dt.datetime:
    return EPOCH + dt.timedelta(microseconds=int(us))


def _random_case(rng: np.random.Generator, n_keys: int):
    """Random left/right event frames with colliding timestamps."""
    nl = int(rng.integers(1, 40))
    nr = int(rng.integers(0, 40))
    # coarse grid => frequent exact-equality collisions (the asof edge)
    lt = rng.integers(0, 50, nl) * 1_000_000
    rt = rng.integers(0, 50, max(nr, 1))[:nr] * 1_000_000
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, nl),
        "ts": [_ts(u) for u in lt],
        "lv": rng.integers(0, 1000, nl),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, nr) if nr else np.array([], dtype=int),
        "ts": [_ts(u) for u in rt],
        "rv": (rng.integers(0, 1000, nr) if nr
               else np.array([], dtype=int)).astype("int64"),
    })
    # merge_asof resolves equal-(k, ts) right rows by INPUT ROW ORDER —
    # not a relational notion, so the comparison demands uniqueness
    right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas_merge_asof(spark, direction):
    rng = np.random.default_rng(20260814 if direction == "backward" else 7)
    for case in range(8):
        left, right = _random_case(rng, n_keys=3)
        tol = None if case % 2 == 0 else int(rng.integers(1, 10)) * 1_000_000

        sl = spark.createDataFrame(left)
        sr = (
            spark.createDataFrame(right)
            if len(right)
            else spark.createDataFrame([], "k long, ts timestamp, rv long")
        )
        got = asof_join(
            sl, sr, on="ts", by="k", direction=direction, tolerance_us=tol
        ).toPandas()

        lp = left.sort_values(["ts", "k"]).reset_index(drop=True)
        rp = right.sort_values(["ts", "k"]).reset_index(drop=True)
        exp = pd.merge_asof(
            lp, rp, on="ts", by="k", direction=direction,
            tolerance=(pd.Timedelta(microseconds=tol)
                       if tol is not None else None),
            suffixes=("", "_r"),
        )

        key = ["k", "ts", "lv"]
        g = got.sort_values(key).reset_index(drop=True)
        e = exp.sort_values(key).reset_index(drop=True)
        assert len(g) == len(e), (case, direction, tol)
        ga = g["rv_r"].astype("float64").to_numpy()
        ea = e["rv"].astype("float64").to_numpy()
        assert np.array_equal(np.isnan(ga), np.isnan(ea)), (
            case, direction, tol,
        )
        mask = ~np.isnan(ga)
        assert np.array_equal(ga[mask], ea[mask]), (case, direction, tol)


def test_range_join_matches_bruteforce(spark):
    rng = np.random.default_rng(42)
    for case in range(8):
        npts = int(rng.integers(1, 60))
        nint = int(rng.integers(0, 20))
        pts = pd.DataFrame({
            "k": rng.integers(0, 3, npts),
            "pt": [_ts(u) for u in rng.integers(0, 100, npts) * 1_000_000],
            "pid": np.arange(npts, dtype="int64"),
        })
        starts = rng.integers(0, 90, max(nint, 1))[:nint] * 1_000_000
        lens = rng.integers(0, 30, max(nint, 1))[:nint] * 1_000_000
        ivs = pd.DataFrame({
            "k": rng.integers(0, 3, nint) if nint else np.array([], int),
            "s": [_ts(u) for u in starts],
            "e": [_ts(u + d) for u, d in zip(starts, lens)],
            "iid": np.arange(nint, dtype="int64"),
        })

        sp = spark.createDataFrame(pts)
        si = (
            spark.createDataFrame(ivs)
            if nint
            else spark.createDataFrame(
                [], "k long, s timestamp, e timestamp, iid long"
            )
        )
        # deliberately small bucket so multi-bucket replication paths run
        got = range_join_bucketed(
            sp, si, "pt", "s", "e", by="k", bucket_width_us=7_000_000
        ).toPandas()

        expected = set()
        for p in pts.itertuples():
            for i in ivs.itertuples():
                if p.k == i.k and i.s <= p.pt <= i.e:
                    expected.add((p.pid, i.iid))
        assert set(zip(got["pid"], got["iid"])) == expected, case
        # no duplicate pairs from multi-bucket interval replication
        assert len(got) == len(expected), case

"""Randomized equivalence testing for the statistics/sketch/sampling
operators — each checked against an INDEPENDENT pure-Python
recomputation (hashlib md5, integer sums, Counter) over seeded random
inputs, the engine-independent pin that caught the r5 MinHash family
collapse.  Complements the DuckDB oracles: a bug that shifted BOTH the
Spark expression and the SQL twin identically would pass the catalog
gate but fail here."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_ols_fit_matches_python_closed_form_random(spark):
    """ols_fit on random integer data == the closed form computed with
    arbitrary-precision Python ints + the same final double ops, per
    group, bit-for-bit."""
    from psweep_spark.operators.stats import ols_fit

    rng = np.random.default_rng(20260815)
    for case in range(6):
        n = int(rng.integers(5, 200))
        g = rng.integers(0, 4, n)
        x = rng.integers(-1000, 1000, n)
        y = rng.integers(-100000, 100000, n)
        rows = [(f"g{gi}", int(xi), int(yi)) for gi, xi, yi in zip(g, x, y)]
        df = spark.createDataFrame(rows, "g string, x long, y long")
        got = {r["g"]: r for r in ols_fit(df, "x", "y", ["g"]).collect()}

        by_g = defaultdict(list)
        for gi, xi, yi in rows:
            by_g[gi].append((xi, yi))
        for gi, pts in by_g.items():
            nn = len(pts)
            sx = sum(p[0] for p in pts)
            sy = sum(p[1] for p in pts)
            sxy = sum(p[0] * p[1] for p in pts)
            sxx = sum(p[0] * p[0] for p in pts)
            syy = sum(p[1] * p[1] for p in pts)
            cov, varx, vary = (
                nn * sxy - sx * sy, nn * sxx - sx * sx, nn * syy - sy * sy,
            )
            r = got[gi]
            assert r["n"] == nn, (case, gi)
            if varx == 0:
                assert r["slope"] is None
                continue
            slope = float(cov) / float(varx)
            intercept = (float(sy) - slope * float(sx)) / float(nn)
            assert (r["slope"], r["intercept"]) == (slope, intercept), (case, gi)
            if vary != 0:
                r2 = (float(cov) * float(cov)) / (float(varx) * float(vary))
                assert r["r2"] == r2, (case, gi)


def test_cms_matches_python_sketch_random(spark):
    """cms_cells + cms_estimate == an independent Python CMS built with
    hashlib md5 slices and Counter — cell-for-cell and estimate-for-
    estimate, including collisions."""
    from psweep_spark.operators.sketch import cms_cells, cms_estimate

    rng = np.random.default_rng(7)
    depth, width, salt = 4, 32, "prop"
    for case in range(4):
        n = int(rng.integers(50, 800))
        items = [f"it{int(v)}" for v in rng.zipf(1.7, n) % 60]
        df = spark.createDataFrame([(i,) for i in items], "token string")

        def bucket(item: str, i: int) -> int:
            h = _md5_hex(f"{salt}|{item}")
            return int(h[8 * i:8 * i + 8], 16) % width

        ref_cells: Counter = Counter()
        for it in items:
            for i in range(depth):
                ref_cells[(i, bucket(it, i))] += 1

        cells = cms_cells(df, "token", depth=depth, width=width, salt=salt)
        got_cells = {(r["i"], r["col"]): r["cnt"] for r in cells.collect()}
        assert got_cells == dict(ref_cells), case

        probes = df.distinct()
        est = {
            r["token"]: r["est_cnt"]
            for r in cms_estimate(
                cells, probes, "token", depth, width, salt
            ).collect()
        }
        truth = Counter(items)
        for it in truth:
            ref_est = min(
                ref_cells.get((i, bucket(it, i)), 0) for i in range(depth)
            )
            assert est[it] == ref_est, (case, it)
            assert est[it] >= truth[it], (case, it)


def test_weighted_sample_per_group_matches_python_random(spark):
    """weighted_sample_topk_per_group == the E-S draw recomputed in
    pure Python (md5 52-bit uniform, math.log, per-group top-k with
    the same tie-break), exact kept-set equality."""
    from psweep_spark.operators.sampling import weighted_sample_topk_per_group

    rng = np.random.default_rng(99)
    for case in range(4):
        n = int(rng.integers(30, 400))
        k = int(rng.integers(1, 6))
        salt = f"s{case}"
        rows = [
            (int(i), f"g{int(rng.integers(0, 3))}",
             float(rng.integers(1, 500)))
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "key long, g string, w double")
        got = {
            (r["g"], r["key"], r["sample_rank"])
            for r in weighted_sample_topk_per_group(
                df.repartition(7), "key", "w", "g", k=k, salt=salt
            ).collect()
        }

        def es_key(key: int, w: float) -> float:
            h = _md5_hex(f"{salt}{key}")
            u = (int(h[:13], 16) + 1.0) / float(1 << 52)
            return math.log(u) / w

        by_g = defaultdict(list)
        for key, g, w in rows:
            by_g[g].append((es_key(key, w), key))
        want = set()
        for g, scored in by_g.items():
            top = sorted(scored, key=lambda t: (-t[0], t[1]))[:k]
            for rank, (_, key) in enumerate(top, 1):
                want.add((g, key, rank))
        assert got == want, case

"""Grid DSL contract tests — mirror reference tests/test_all.py:707-883."""

import numpy as np
import pytest

from psweep_spark import (
    filter_params_dup_hash,
    filter_params_unique,
    flatten_dict,
    intspace,
    itr2params,
    logspace,
    merge_dicts,
    pgrid,
    pgrid_df,
    plist,
    plist_df,
    pset_hash,
    stargrid,
    stargrid_df,
    zip_df,
)


def test_plist():
    assert plist("a", [1, 2, 3]) == [{"a": 1}, {"a": 2}, {"a": 3}]


def test_pgrid_product():
    a = plist("a", [1, 2])
    b = plist("b", [77, 88])
    c = plist("c", ["const"])
    assert pgrid(a, b, c) == [
        {"a": 1, "b": 77, "c": "const"},
        {"a": 1, "b": 88, "c": "const"},
        {"a": 2, "b": 77, "c": "const"},
        {"a": 2, "b": 88, "c": "const"},
    ]
    assert pgrid([a, b, c]) == pgrid(a, b, c)
    assert pgrid([a]) == a


def test_pgrid_zip():
    a = plist("a", [1, 2])
    b = plist("b", [77, 88])
    c = plist("c", ["const"])
    assert pgrid(zip(a, b), c) == [
        {"a": 1, "b": 77, "c": "const"},
        {"a": 2, "b": 88, "c": "const"},
    ]


def test_itr2params_nested():
    a = plist("a", [1, 2])
    b = plist("b", [77, 88])
    import itertools

    assert itr2params(itertools.product(zip(a, b))) == [
        {"a": 1, "b": 77},
        {"a": 2, "b": 88},
    ]


def test_dup_keys_rejected():
    a1 = plist("a", [1, 2])
    a2 = plist("a", [3, 4])
    with pytest.raises(ValueError):
        pgrid(a1, a2)
    with pytest.raises(ValueError):
        merge_dicts({"a": 1}, {"a": 2}, allow_dup_keys=False)
    assert merge_dicts({"a": 1}, {"a": 2}) == {"a": 2}


def test_unequal_pset_lengths_rejected():
    with pytest.raises(ValueError):
        itr2params([({"a": 1},), ({"a": 2}, {"b": 3})])


def test_stargrid():
    # reference docstring example, psweep.py:1120-1135
    const = dict(a=1, b=77, c=11)
    a = plist("a", [1, 2, 3, 4])
    b = plist("b", [77, 88, 99])
    got = stargrid(const, vary=[a, b])
    assert got == [
        {"a": 1, "b": 77, "c": 11},
        {"a": 2, "b": 77, "c": 11},
        {"a": 3, "b": 77, "c": 11},
        {"a": 4, "b": 77, "c": 11},
        {"a": 1, "b": 88, "c": 11},
        {"a": 1, "b": 99, "c": 11},
    ]
    assert len(stargrid(const, vary=[a, b], skip_dups=False)) == 7
    labeled = stargrid(const, vary=[a, b], vary_labels=["a", "b"])
    assert labeled[0]["_vary"] == "a"
    assert labeled[-1]["_vary"] == "b"


def test_flatten_dict():
    assert flatten_dict(dict(a=1, b=dict(c=2, d={23: 42}))) == {
        "a": 1,
        "b_c": 2,
        "b_d_23": 42,
    }


def test_logspace_intspace():
    # reference tests/test_all.py:847-883
    np.testing.assert_allclose(
        logspace(1, 100, num=3), np.logspace(0, 2, num=3)
    )
    # offset -> more evenly spaced; bounds always exact
    for off in [1e-16, 1, 10]:
        x = logspace(2, 3, num=5, offset=off)
        assert abs(x[0] - 2) < 1e-9 and abs(x[-1] - 3) < 1e-9
    assert intspace(0, 4, num=5).tolist() == [0, 1, 2, 3, 4]
    assert intspace(0, 2, num=5).tolist() == [0, 1, 2]  # dedup shrinks


def test_filter_params_unique_order_preserving():
    params = [{"a": 1}, {"a": 2}, {"a": 1}, {"a": 3}]
    assert filter_params_unique(params) == [{"a": 1}, {"a": 2}, {"a": 3}]


def test_filter_params_dup_hash():
    params = [{"a": 1}, {"a": 2}, {"a": 3}]
    hashes = [pset_hash({"a": 2})]
    assert filter_params_dup_hash(params, hashes) == [{"a": 1}, {"a": 3}]


# -- lazy tier ---------------------------------------------------------------


def test_pgrid_df_matches_eager(spark):
    a = plist_df(spark, "a", [1, 2])
    b = plist_df(spark, "b", [77, 88])
    got = {tuple(r) for r in pgrid_df(a, b).collect()}
    exp = {(p["a"], p["b"]) for p in pgrid(plist("a", [1, 2]), plist("b", [77, 88]))}
    assert got == exp


def test_pgrid_df_dup_cols_rejected(spark):
    a = plist_df(spark, "a", [1])
    with pytest.raises(ValueError):
        pgrid_df(a, plist_df(spark, "a", [2]))


def test_pgrid_df_is_lazy_and_huge(spark):
    # 10^8-row grid: plan builds instantly, count pushes to Spark
    a = spark.range(10_000).withColumnRenamed("id", "a")
    b = spark.range(10_000).withColumnRenamed("id", "b")
    assert pgrid_df(a, b).count() == 100_000_000


def test_zip_df(spark):
    a = plist_df(spark, "a", [1, 2, 3])
    b = plist_df(spark, "b", [7, 8, 9])
    got = sorted(tuple(r) for r in zip_df(a, b).collect())
    assert got == [(1, 7), (2, 8), (3, 9)]


def test_stargrid_df_matches_eager(spark):
    const = dict(a=1, b=77)
    a = plist_df(spark, "a", [1, 2])
    b = plist_df(spark, "b", [77, 88])
    df = stargrid_df(spark, const, [a, b], vary_labels=["a", "b"])
    got = {(r["a"], r["b"], r["_vary"]) for r in df.collect()}
    assert got == {(1, 77, "a"), (2, 77, "a"), (1, 77, "b"), (1, 88, "b")}

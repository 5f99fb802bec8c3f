"""Query/projection/sink operators — SURVEY §2.3 parity."""

import os

import pytest
from pyspark.sql import functions as F

from psweep_spark import (
    check_calc_dir,
    df_extract_dicts,
    df_extract_pset,
    df_extract_row,
    df_filter_conds,
    df_to_json,
    df_to_table,
    pgrid,
    plist,
    run,
)


def _mk_func():
    def f(pset):
        return {"result_": pset["a"] * 10.0}

    return f


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    calc = str(tmp_path_factory.mktemp("qdb") / "calc")
    params = pgrid([plist("a", [1, 2, 3, 4]), plist("b", ["x", "y"])])
    return run(spark, _mk_func(), params, calc_dir=calc), calc


def test_df_filter_conds(spark, db):
    df, _ = db
    out = df_filter_conds(df, [F.col("a") > 1, F.col("b") == "x"])
    assert {r["a"] for r in out.collect()} == {2, 3, 4}
    out = df_filter_conds(df, [F.col("a") == 1, F.col("a") == 2], op="or")
    assert out.count() == 4
    out = df_filter_conds(df, [F.col("a") <= 2, F.col("b") == "x"], op="xor")
    assert out.count() == 4  # (a<=2 & b=y) + (a>2 & b=x)
    with pytest.raises(ValueError):
        df_filter_conds(df, [F.col("a") > 1], op="nope")


def test_df_extract_dicts_ordered(spark, db):
    df, _ = db
    dicts = df_extract_dicts(df)
    assert len(dicts) == 8
    assert [d["_pset_seq"] for d in dicts] == list(range(8))
    assert all("result_" in d and "a" in d for d in dicts)


def test_df_extract_row_pset(spark, db):
    df, _ = db
    pid = df.orderBy("_pset_seq").first()["_pset_id"]
    row = df_extract_row(df, pid)
    assert row["_pset_id"] == pid
    pset = df_extract_pset(df, pid)
    assert set(pset) == {"a", "b"}
    with pytest.raises(ValueError):
        df_extract_row(df, "not-a-real-id")


def test_check_calc_dir(spark, db, tmp_path):
    df, _ = db
    cd = str(tmp_path / "artifacts")
    ids = [r["_pset_id"] for r in df.select("_pset_id").collect()]
    os.makedirs(os.path.join(cd, ids[0]))
    os.makedirs(os.path.join(cd, "00000000-0000-4000-8000-000000000000"))
    out = check_calc_dir(cd, df)
    assert set(out["db_not_disk"]) == set(ids[1:])
    assert out["disk_not_db"] == ["00000000-0000-4000-8000-000000000000"]


def test_df_to_json_and_table(spark, db, tmp_path):
    df, _ = db
    js = df_to_json(df)
    assert len(js) == 8 and js[0].startswith("{")
    path = str(tmp_path / "out.json")
    df_to_json(df, path)
    assert os.path.isdir(path)
    txt = df_to_table(df)
    assert "result_" in txt and "_run_id" not in txt
    txt_all = df_to_table(df, prefix_cols=True)
    assert "_run_id" in txt_all


def test_catalog_contract():
    """Driver contract: every query has an oracle twin (no weak
    rows-only checks), names are stable identifiers, and the flagship
    query is registered."""
    import __spark_entry__ as entry

    qs, orc = entry.queries(), entry.oracle_sql()
    assert len(qs) >= 127
    assert set(orc) == set(qs), set(qs) ^ set(orc)
    assert all(n.replace("_", "").isalnum() for n in qs)
    assert "q1_pricing_summary" in qs

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


def test_reference_surface_compat(spark, tmp_path):
    """Every public name of the reference's psweep module resolves at
    this package's top level (drop-in script compatibility), and the
    util-layer functions behave per their reference contracts."""
    import psweep_spark as ps

    ref_names = [
        "FileTemplate", "Machine", "PsweepHashError",
        "capture_logs_wrapper", "check_calc_dir", "df_ensure_dtypes",
        "df_extract_dicts", "df_extract_params", "df_extract_pset",
        "df_extract_row", "df_filter_conds", "df_print", "df_read",
        "df_to_json", "df_update_pset_cols", "df_update_pset_hash",
        "df_write", "file_read", "file_write", "filter_cols",
        "filter_params_dup_hash", "filter_params_unique", "flatten",
        "flatten_dict", "fullpath", "func_wrapper",
        "gather_calc_templates", "gather_machines", "get_many_uuids",
        "get_uuid", "git_clean", "git_enter", "git_exit", "in_git_repo",
        "intspace", "is_seq", "itr", "itr2params", "json_read",
        "json_write", "logspace", "makedirs", "merge_dicts", "pgrid",
        "pickle_read", "pickle_write", "plist", "prep_batch",
        "pset_hash", "run", "stargrid", "system",
    ]
    missing = [n for n in ref_names if not hasattr(ps, n)]
    assert not missing, missing

    # df_write/df_read round-trip (reference arg order: fn, df)
    df = spark.range(3).withColumnRenamed("id", "a")
    p = str(tmp_path / "t")
    ps.df_write(p, df)
    assert ps.df_read(p, spark=spark).count() == 3

    # df_update_pset_cols widens + rehashes
    from pyspark.sql import functions as F

    out = ps.df_update_pset_cols(df, ["a", "b"])
    assert "b" in out.columns
    r = out.where(F.col("a") == 1).first()
    assert r["b"] is None
    assert r["_pset_hash"] == ps.pset_hash({"a": 1, "b": None})

    # func_wrapper stamps and runs; capture_logs_wrapper captures
    pset = {"_calc_dir": str(tmp_path), "_run_id": "r", "_pset_id": "p", "x": 2}
    got = ps.func_wrapper(dict(pset), lambda q: {"y_": q["x"] * 2})
    assert got["y_"] == 4 and got["_pset_runtime"] >= 0 and got["_exec_host"]

    def noisy(q):
        print("hello from func")
        return {"y_": 1}

    got2 = ps.capture_logs_wrapper(dict(pset), noisy, "db")
    assert "hello from func" in got2["_logs"]

    # PsweepHashError is catchable as TypeError (reference parity)
    assert issubclass(ps.PsweepHashError, TypeError)


def test_df_print_index_parity(spark, db, capsys):
    """`df_print(index=True)` reproduces the reference's printed layout
    (psweep.py:515-619): pandas ``to_string`` with the DataFrame index
    shown — and since the reference's index IS the pset seq, the index
    column must carry ``_pset_seq`` values.  The expected text is built
    independently with pandas over the same rows."""
    import pandas as pd

    from psweep_spark import df_print

    df, _ = db
    df_print(df, index=True, cols=["a", "b", "result_"])
    shown = capsys.readouterr().out

    rows = df.orderBy("_pset_seq").select(
        "a", "b", "result_", "_pset_seq"
    ).collect()
    expected_pdf = pd.DataFrame(
        [{"a": r["a"], "b": r["b"], "result_": r["result_"]} for r in rows],
        index=[r["_pset_seq"] for r in rows],
    )
    assert shown.strip() == expected_pdf.to_string(index=True).strip()
    # default stays the spark grid, indexless
    df_print(df, cols=["a"])
    grid = capsys.readouterr().out
    assert "+" in grid and "_pset_seq" not in grid

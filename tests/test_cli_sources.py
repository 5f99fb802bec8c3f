"""CLI sinks (db2json/db2table/check-calc-dir) and the format-generic
source surface."""

from __future__ import annotations

import json
import subprocess
import sys

from psweep_spark import plist, run
from psweep_spark.sources import (
    file_read,
    file_write,
    json_read,
    json_write,
    pickle_read,
    pickle_write,
    read_table,
    write_table,
)


def _mk_db(spark, tmp_path):
    calc = str(tmp_path / "calc")
    run(spark, lambda p: {"r_": p["a"] * 2.0}, plist("a", [1, 2, 3]), calc_dir=calc)
    return calc


def _cli(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "psweep_spark.cli", *args],
        capture_output=True,
        text=True,
        timeout=300,
        env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
             "HOME": "/root", "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
             "SPARK_GRAFT_CPUS": "4"},
    )


def test_cli_db2json(spark, tmp_path):
    calc = _mk_db(spark, tmp_path)
    cp = _cli("db2json", f"{calc}/database")
    assert cp.returncode == 0, cp.stderr[-2000:]
    rows = [json.loads(ln) for ln in cp.stdout.splitlines() if ln.startswith("{")]
    assert len(rows) == 3
    assert {r["a"] for r in rows} == {1, 2, 3}
    assert all(r["r_"] == r["a"] * 2.0 for r in rows)


def test_cli_db2table_and_check(spark, tmp_path):
    calc = _mk_db(spark, tmp_path)
    cp = _cli("db2table", f"{calc}/database")
    assert cp.returncode == 0, cp.stderr[-2000:]
    assert "r_" in cp.stdout and "_pset_id" not in cp.stdout
    cp2 = _cli("check-calc-dir", calc)
    assert cp2.returncode == 0, cp2.stderr[-2000:]
    out = json.loads(cp2.stdout)
    # run() didn't create per-pset dirs (no file workloads) → db_not_disk=3
    assert len(out["db_not_disk"]) == 3
    assert out["disk_not_db"] == []


def test_read_write_table_roundtrip(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "x")
    for fmt in ("parquet", "json", "csv"):
        p = str(tmp_path / f"t_{fmt}")
        write_table(df, p, fmt)
        back = read_table(spark, p, fmt)
        assert back.count() == 10
        assert {r["x"] for r in back.collect()} == set(range(10))


def test_file_helpers(tmp_path):
    p = tmp_path / "deep" / "nested" / "f.txt"
    file_write(str(p), "hello")
    assert file_read(str(p)) == "hello"
    pickle_write(str(tmp_path / "d" / "o.pk"), {"a": [1, 2]})
    assert pickle_read(str(tmp_path / "d" / "o.pk")) == {"a": [1, 2]}
    json_write(str(tmp_path / "j" / "o.json"), [1, "x"])
    assert json_read(str(tmp_path / "j" / "o.json")) == [1, "x"]

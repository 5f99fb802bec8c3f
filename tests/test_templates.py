"""Template/batch-prep operators (SURVEY §2.4) — file-layout and
submit-script contracts mirroring reference tests/test_all.py:886-986."""

from __future__ import annotations

import os

import pytest

from psweep_spark import plist
from psweep_spark.templates import FileTemplate, Machine, prep_batch


@pytest.fixture()
def templ_tree(tmp_path):
    calc_t = tmp_path / "templates" / "calc"
    calc_t.mkdir(parents=True)
    (calc_t / "input.txt").write_text("param_a={{a}} id={{_pset_id}}\n")
    m_dir = tmp_path / "templates" / "machines" / "cluster"
    m_dir.mkdir(parents=True)
    (m_dir / "info.yaml").write_text("subcmd: sbatch\ncores: 16\n")
    (m_dir / "jobscript").write_text(
        "#!/bin/sh\n#SBATCH -c {{cores}}\necho {{a}} on {{machine}}\n"
    )
    return tmp_path


def test_file_template_jinja_strict(tmp_path):
    f = tmp_path / "t.templ"
    f.write_text("x={{x}}")
    t = FileTemplate(str(f))
    assert t.target == "t"
    assert t.fill({"x": 3}) == "x=3"
    with pytest.raises(Exception):
        t.fill({"y": 1})  # StrictUndefined: missing key is an error


def test_file_template_dollar(tmp_path):
    f = tmp_path / "in.txt"
    f.write_text("v=$v")
    assert FileTemplate(str(f), mode="dollar").fill({"v": 7}) == "v=7"


def test_machine_attrs(templ_tree):
    m = Machine(str(templ_tree / "templates" / "machines" / "cluster"))
    assert m.name == "cluster"
    assert m.subcmd == "sbatch"
    assert m.cores == 16


def test_prep_batch_layout_and_scripts(spark, templ_tree, monkeypatch):
    monkeypatch.chdir(templ_tree)
    params = plist("a", [1, 2, 3])
    df = prep_batch(spark, params, calc_dir=str(templ_tree / "calc"))
    rows = df.select("_pset_id", "a").collect()
    assert len(rows) == 3
    for r in rows:
        d = templ_tree / "calc" / r["_pset_id"]
        assert (d / "input.txt").read_text() == (
            f"param_a={r['a']} id={r['_pset_id']}\n"
        )
        job = (d / "jobscript").read_text()
        assert "#SBATCH -c 16" in job
        assert f"echo {r['a']} on cluster" in job
    script = (templ_tree / "calc" / "run_cluster.sh").read_text()
    assert script.count("sbatch jobscript") == 3
    assert "#cd" not in script  # single run: nothing commented out


def test_prep_batch_second_run_comments_old(spark, templ_tree, monkeypatch):
    monkeypatch.chdir(templ_tree)
    prep_batch(spark, plist("a", [1, 2]), calc_dir=str(templ_tree / "calc"))
    prep_batch(spark, plist("a", [3]), calc_dir=str(templ_tree / "calc"))
    script = (templ_tree / "calc" / "run_cluster.sh").read_text()
    lines = [ln for ln in script.splitlines() if "sbatch jobscript" in ln]
    assert len(lines) == 3
    assert sum(ln.startswith("#") for ln in lines) == 2  # old run commented
    assert sum(not ln.startswith("#") for ln in lines) == 1
    assert "run_seq=1" in [ln for ln in lines if not ln.startswith("#")][0]

"""Chained (dependent) studies: study 2's grid is built FROM study 1's
results — the reference's `tree_study` workflow
(`/root/reference/examples/tree_study.py:103-146`), Spark-native.

Study 1 sweeps a coarse parameter; study 2 refines around each of study
1's best results, carrying the parent pset id for lineage.  Both studies
append to the SAME database — schema union + NULL-backfill handles the
new columns, and `_run_seq` separates the generations.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    from pyspark.sql import functions as F

    import psweep_spark as ps

    spark = ps.get_spark("example-tree-study")
    calc = os.path.join(tempfile.mkdtemp(prefix="psx_tree_"), "calc")

    # -- study 1: coarse sweep ------------------------------------------
    def coarse(pset):
        x = pset["x"]
        return {"loss_": (x - 2.7) ** 2}

    df1 = ps.run(spark, coarse, ps.plist("x", [0.0, 1.0, 2.0, 3.0, 4.0]),
                 calc_dir=calc)
    assert df1.count() == 5

    # -- pick seeds for study 2 from study 1's results ------------------
    best = (
        df1.orderBy("loss_")
        .select("x", "_pset_id")
        .limit(2)
        .collect()
    )

    # -- study 2: refine around each seed, keep lineage -----------------
    def fine(pset):
        x = pset["x"]
        return {"loss_": (x - 2.7) ** 2}

    refine = ps.itr2params(
        (
            {"x": round(seed["x"] + dx, 3), "parent_pset": seed["_pset_id"]},
        )
        for seed in best
        for dx in (-0.25, 0.0, 0.25)
    )
    df2 = ps.run(spark, fine, refine, calc_dir=calc, skip_dups=True)

    # both generations live in one DB; lineage is queryable.  Note the
    # refined psets carry a parent_pset column, so even x values that
    # repeat study 1 hash differently (the hash covers ALL pset columns
    # after the schema union) — skip_dups removes nothing here.
    df2.createOrReplaceTempView("db")
    gens = spark.sql(
        "SELECT _run_seq, count(*) AS n FROM db GROUP BY _run_seq ORDER BY 1"
    ).collect()
    assert [g["n"] for g in gens] == [5, 6]  # 5 coarse + 2 seeds × 3 offsets

    champion = (
        df2.filter(F.col("parent_pset").isNotNull())
        .orderBy("loss_")
        .select("x", "loss_", "parent_pset")
        .first()
    )
    assert abs(champion["x"] - 2.75) < 1e-9
    ps.df_print(df2.orderBy("_pset_seq"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Minimal sweep: vary two parameters, run distributed, query the DB.

Spark-native twin of the reference's `examples/vary_2_params.py`
(`/root/reference/examples/vary_2_params.py`): the grid is a lazy
DataFrame, execution is one mapInPandas stage over executors, and the
database is append-only Parquet queryable with Spark SQL.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import psweep_spark as ps

    spark = ps.get_spark("example-vary-two")
    calc = os.path.join(tempfile.mkdtemp(prefix="psx_vary_"), "calc")

    def func(pset):
        return {"result_": pset["a"] * pset["b"]}

    params = ps.pgrid([ps.plist("a", [1, 2, 3, 4]), ps.plist("b", [8, 9])])
    df = ps.run(spark, func, params, calc_dir=calc)
    assert df.count() == 8

    # cheap funcs at scale: the vectorized batch contract skips the
    # per-pset dict loop (~100x less per-core CPU on the func stage)
    def func_pandas(pdf):
        import pandas as pd

        return pd.DataFrame({"result_": pdf["a"] * pdf["b"]})

    vec = ps.run(
        spark, None, params,
        calc_dir=os.path.join(tempfile.mkdtemp(prefix="psx_vec_"), "calc"),
        func_pandas=func_pandas,
    )
    assert sorted(
        (r["a"], r["b"], r["result_"]) for r in vec.collect()
    ) == sorted((r["a"], r["b"], r["result_"]) for r in df.collect())

    # the query surface is full Spark SQL
    df.createOrReplaceTempView("db")
    top = spark.sql(
        "SELECT a, max(result_) AS best FROM db GROUP BY a ORDER BY a"
    ).collect()
    assert [r["best"] for r in top] == [9, 18, 27, 36]
    ps.df_print(df)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

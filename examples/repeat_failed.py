"""Safe-mode failures + selective re-run of only the failed psets.

Spark-native twin of `/root/reference/examples/repeat_failed.py`:
failures land as `_failed`/`_exc_txt` columns instead of killing the
run; the repeat is an anti-join-style selection of failed psets whose
fresh results append under a new `_run_seq`, and `latest_per_pset`
resolves the winner per pset hash.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import psweep_spark as ps

    spark = ps.get_spark("example-repeat-failed")
    calc = os.path.join(tempfile.mkdtemp(prefix="psx_fail_"), "calc")

    flaky_below = 3

    def func(pset):
        if pset["a"] < flaky_below:
            raise RuntimeError(f"flaky for a={pset['a']}")
        return {"result_": float(pset["a"]) ** 2}

    params = ps.plist("a", [1, 2, 3, 4, 5])
    df = ps.run(spark, func, params, calc_dir=calc, safe=True)
    failed = ps.failed_psets(df)
    assert failed.count() == 2

    # repeat ONLY the failed psets with a fixed workload
    retry_params = ps.df_extract_params(failed)

    def fixed(pset):
        return {"result_": float(pset["a"]) ** 2}

    df2 = ps.run(spark, fixed, retry_params, calc_dir=calc, safe=True)
    latest = ps.latest_per_pset(df2)
    assert latest.count() == 5
    assert latest.filter("_failed").count() == 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

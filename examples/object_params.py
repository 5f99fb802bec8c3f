"""Arbitrary-Python-object params: sweep over FUNCTIONS as a parameter.

Spark-native twin of the reference's dtype=object flexibility
(`/root/reference/tests/test_all.py:1360-1437`): a pset may hold
callables, class instances, or mixed-type values.  With
``pickle_objects=True`` the engine stores such columns as framed
cloudpickle BinaryType cells, the canonical hash stays value-wise
(``pset_hash(extracted) == stored _pset_hash``), and ``skip_dups``
incremental re-runs keep working because identical objects re-pickle to
identical hashes.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import psweep_spark as ps

    spark = ps.get_spark("example-object-params")
    calc = os.path.join(tempfile.mkdtemp(prefix="psx_obj_"), "calc")

    def func(pset):
        # the object param arrives as a LIVE callable on the executor
        return {"y_": float(pset["transform"](pset["x"]))}

    params = ps.pgrid(
        ps.plist("transform", [np.sin, np.cos, np.tanh]),
        ps.plist("x", [0.0, 0.5, 1.0]),
    )
    df = ps.run(spark, func, params, calc_dir=calc, pickle_objects=True)
    assert df.count() == 9

    # extraction hands back live objects; hashes round-trip
    psets = ps.df_extract_params(df)
    rows = df.orderBy("_pset_seq").collect()
    for pset, row in zip(psets, rows):
        assert callable(pset["transform"])
        assert ps.pset_hash(pset) == row["_pset_hash"]

    # incremental re-run with one extra function: only 3 new rows
    params2 = ps.pgrid(
        ps.plist("transform", [np.sin, np.cos, np.tanh, np.exp]),
        ps.plist("x", [0.0, 0.5, 1.0]),
    )
    df2 = ps.run(
        spark, func, params2, calc_dir=calc, pickle_objects=True,
        skip_dups=True,
    )
    assert df2.count() == 12
    print("object-params example OK:", df2.count(), "rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

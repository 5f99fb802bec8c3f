"""HPC batch-prep workflow: render job templates per pset, emit submit
scripts (reference `examples/batch_with_templates/`,
`/root/reference/src/psweep/psweep.py:1566-1660`).  The render runs
inside the distributed mapInPandas stage; only the tiny submit-script
generation is driver-side.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import psweep_spark as ps

    spark = ps.get_spark("example-batch-templates")
    base = tempfile.mkdtemp(prefix="psx_tmpl_")
    ct = os.path.join(base, "templates", "calc")
    mt = os.path.join(base, "templates", "machines", "cluster")
    os.makedirs(ct)
    os.makedirs(mt)
    with open(os.path.join(ct, "input.ini"), "w") as fh:
        fh.write("[params]\nnx = {{nx}}\nny = {{ny}}\n")
    with open(os.path.join(mt, "info.yaml"), "w") as fh:
        fh.write("subcmd: sbatch\n")
    with open(os.path.join(mt, "jobscript"), "w") as fh:
        fh.write("#!/bin/sh\n#SBATCH -J {{machine}}-{{nx}}x{{ny}}\n./solver input.ini\n")

    calc = os.path.join(base, "calc")
    params = ps.pgrid([ps.plist("nx", [16, 32]), ps.plist("ny", [16, 32])])
    df = ps.prep_batch(
        spark,
        params,
        calc_dir=calc,
        calc_templ_dir=ct,
        machine_templ_dir=os.path.dirname(mt),
    )
    ids = [r["_pset_id"] for r in df.select("_pset_id").collect()]
    assert len(ids) == 4
    for pid in ids:
        assert os.path.isfile(os.path.join(calc, pid, "input.ini"))
        assert os.path.isfile(os.path.join(calc, pid, "jobscript"))
    assert os.path.isfile(os.path.join(calc, "run_cluster.sh"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

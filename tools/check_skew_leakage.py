"""Gate ``docs_leakage_safe_split`` on the SKEW corpus via the
construction oracle (r11; closes the one FAIL in the r11 skew gate).

The direct DuckDB recursive-CTE oracle exhausts temp disk on the skew
corpus — the 10k-doc boilerplate clique's closure is re-evaluated per
CTE reference and spilled >75 GB before dying (first recorded in
CORRECTNESS_LEAKAGE_SPLIT_r9.json's ``_doc``; reproduced twice at the
r11 tip, once on a quiet host).  The engine side runs in seconds.  The
sanctioned alternative is the same construction the sf10 gate uses
(tools/check_sf10_constructed.py): union-find closure + pure-python
md5-bucket split audit over the DuckDB-materialized LSH pair set —
feasible because materializing the PAIRS is linear-ish (the skew main
gate runs ``dedup_minhash_lsh``'s direct oracle fine); only the
recursive closure explodes.  The construction is validated bit-for-bit
against the true direct oracle at sf1 in the SAME round's
CORRECTNESS_SF10_CONSTRUCTED artifact (``validate@sf1:
docs_leakage_safe_split``), so this is a validated oracle, not a
weaker check.

Merges the result into CORRECTNESS_SKEW_r11.json (replacing the
disk-exhaustion FAIL) with provenance recorded in-artifact.

Usage: python tools/check_skew_leakage.py [skew_dir] [artifact]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from check_sf10_constructed import (  # noqa: E402
    compare,
    connect,
    leakage_split_expected,
)


def main() -> int:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "scale_data", "skew_sf1"
    )
    artifact = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "CORRECTNESS_SKEW_r11.json"
    )
    import __spark_entry__ as entrymod
    from psweep_spark.session import get_spark

    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    con = connect(skew_dir)

    t0 = time.time()
    lsh_pairs = con.sql(oracles["dedup_minhash_lsh"]).df()
    print(f"skew LSH pair set: {len(lsh_pairs)} pairs "
          f"({time.time() - t0:.1f}s)")
    expected = leakage_split_expected(con, lsh_pairs)

    spark = get_spark("skew-leakage-gate")
    got = (
        queries["docs_leakage_safe_split"](spark, skew_dir)
        .toPandas()
        .sort_values("split")
        .reset_index(drop=True)
    )
    expected = expected.sort_values("split").reset_index(drop=True)

    results: dict[str, dict] = {}
    compare(
        "docs_leakage_safe_split", expected, got, results,
        "union-find + python md5 split audit over DuckDB-materialized "
        "LSH pairs (validated vs true oracle at sf1, "
        "CORRECTNESS_SF10_CONSTRUCTED_r11 validate@sf1 leg)",
    )
    entry = results["docs_leakage_safe_split"]
    entry["provenance"] = (
        "re-gated standalone after the main skew gate's direct "
        "recursive-CTE oracle exhausted DuckDB temp disk (>75 GB spill; "
        "same failure mode recorded in CORRECTNESS_LEAKAGE_SPLIT_r9 "
        "_doc); engine side unchanged, oracle swapped to the "
        "sf1-validated construction (tools/check_skew_leakage.py)"
    )
    entry["n_lsh_pairs"] = int(len(lsh_pairs))

    ok = entry["status"] == "ok"
    if os.path.isfile(artifact):
        with open(artifact) as fh:
            doc = json.load(fh)
        prev = doc["queries"].get("docs_leakage_safe_split", {})
        if prev.get("status") == "FAIL":
            doc["n_fail"] = max(0, doc.get("n_fail", 1) - 1)
            if ok:
                doc["n_ok"] = doc.get("n_ok", 0) + 1
        doc["queries"]["docs_leakage_safe_split"] = entry
        with open(artifact, "w") as fh:
            json.dump(doc, fh, indent=2, sort_keys=True)
        print(f"merged into {artifact}: n_ok={doc.get('n_ok')} "
              f"n_fail={doc.get('n_fail')}")
    print(json.dumps(entry, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

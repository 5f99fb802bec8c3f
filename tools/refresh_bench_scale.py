"""Refresh selected queries in both BENCH_SCALE.json legs.

round 6: the `dedup_clusters` headline now names the LSH-fed CC path
(VERDICT r5 item 3) and the streaming gate lost ~2 s of driver
overhead (item 6), so their r5 leg entries are stale; the two newly
wired operators (`corpus_heavy_hitters`, `docs_weighted_sample`) have
no scale evidence yet.  This wrapper re-runs exactly those queries
through tools/bench_scale.py for each leg (sf0.1->sf1 and sf1->sf10)
and merges the results back into the leg structure, leaving untouched
queries' r5 numbers in place.

round 10: a third decade (VERDICT r9 item 1) — the ``sf10_to_sf100``
leg runs the scale-critical queries at sf10 vs sf100 (5M docs / 600M
lineitem rows, tools/gen_scale_data.py mult=1000).

Usage: python tools/refresh_bench_scale.py [--legs a,b] [query ...]
  --legs: comma-separated leg keys to refresh (default: all legs).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "BENCH_SCALE.json")

DEFAULT = [
    "dedup_clusters",
    "stream_near_dedup_docs",
    "corpus_heavy_hitters",
    "docs_weighted_sample",
]

LEGS = [
    # (leg key, small dir, big dir); leg rows keep bench_scale.py's raw
    # key names (sf0.1_* = small leg, sf1_* = big leg) to match the r5
    # artifact's existing sf1_to_sf10 entries
    ("sf0.1_to_sf1", "/root/testdata/sf0.1",
     os.path.join(REPO, "scale_data", "sf1")),
    ("sf1_to_sf10", os.path.join(REPO, "scale_data", "sf1"),
     os.path.join(REPO, "scale_data", "sf10")),
    ("sf10_to_sf100", os.path.join(REPO, "scale_data", "sf10"),
     os.path.join(REPO, "scale_data", "sf100")),
    # fourth decade, documents only (tools/gen_sf1000_docs.py): the
    # state-bounded sketch family's "flat at any scale" claim gets one
    # more decade of evidence without a 6B-row lineitem tile
    ("sf100_to_sf1000_docs", os.path.join(REPO, "scale_data", "sf100"),
     os.path.join(REPO, "scale_data", "sf1000_docs")),
]


def main() -> int:
    args = sys.argv[1:]
    legs = None
    if args and args[0] == "--legs":
        legs = set(args[1].split(","))
        args = args[2:]
    queries = args or DEFAULT
    with open(PATH) as fh:
        doc = json.load(fh)
    backup = PATH + ".pre_refresh"
    shutil.copy(PATH, backup)

    for leg, small, big in LEGS:
        if legs is not None and leg not in legs:
            continue
        # bench_scale.py writes flat {query: {sf0.1_*, sf1_*}} into
        # BENCH_SCALE.json; run it against a scratch copy and remap.
        scratch = PATH + ".scratch"
        if os.path.exists(scratch):
            os.remove(scratch)
        os.replace(PATH, PATH + ".hold")
        try:
            env = dict(os.environ,
                       SPARK_GRAFT_SF_DIR=small, SPARK_GRAFT_SF1_DIR=big)
            subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "bench_scale.py"),
                 *queries],
                check=True, env=env, cwd=REPO,
            )
            with open(PATH) as fh:
                flat = json.load(fh)
        finally:
            if os.path.exists(PATH):
                os.replace(PATH, scratch)
            os.replace(PATH + ".hold", PATH)
        legmap = doc.setdefault(leg, {})
        for q, row in flat.items():
            if "error" in row:
                print(f"# leg {leg} query {q} errored: {row['error']}")
                continue
            legmap[q] = row
        with open(PATH, "w") as fh:
            json.dump(doc, fh, indent=2, sort_keys=True)
        print(f"merged {len(flat)} queries into leg {leg}")
    os.remove(backup)
    print("wrote BENCH_SCALE.json (legs refreshed)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

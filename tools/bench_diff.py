"""Round-over-round bench adjudication (VERDICT r10 "next round" #2):
split each query's wall-time delta into shuffle-delta vs host-delta.

The r10 verdict's rule: for a wall regression, "shuffle flat + wall up
= host noise; any query with shuffle growth gets a plan diff".  This
tool mechanizes that over two BENCH_LOCAL detail files (bench.py's
sidecar format: queries / query_reps / shuffle_write_mb maps) plus any
number of extra candidate runs — per query it takes the MIN wall
across the new runs (the best quiet-host estimate; medians absorb
within-session noise, min across sessions absorbs between-session
noise) and compares shuffle bytes, which are plan-determined and
host-invariant.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [NEW2.json ...]
Prints a markdown table of the worst regressions and a JSON verdict
line {wall_old, wall_new, shuffle_old_mb, shuffle_new_mb, ...}.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = load(sys.argv[1])
    news = [load(p) for p in sys.argv[2:]]

    qnames = [q for q in old["queries"] if all(q in n["queries"] for n in news)]
    best_new: dict[str, float] = {}
    best_shuf: dict[str, float] = {}
    for q in qnames:
        walls = [n["queries"][q] for n in news if n["queries"][q] >= 0]
        shufs = [
            n.get("shuffle_write_mb", {}).get(q)
            for n in news
            if n.get("shuffle_write_mb", {}).get(q) is not None
        ]
        if not walls:
            continue
        best_new[q] = min(walls)
        if shufs:
            # shuffle bytes are plan-determined: report the median to
            # absorb stage-accounting jitter
            best_shuf[q] = sorted(shufs)[len(shufs) // 2]

    rows = []
    for q in best_new:
        w_old = old["queries"][q]
        w_new = best_new[q]
        s_old = old.get("shuffle_write_mb", {}).get(q)
        s_new = best_shuf.get(q)
        wall_ratio = round(w_new / w_old, 2) if w_old > 0 else None
        shuf_ratio = (
            round(s_new / s_old, 2)
            if s_old and s_new is not None and s_old > 0.5
            else None
        )
        verdict = "host" if (shuf_ratio is None or shuf_ratio <= 1.2) else "plan"
        rows.append((q, w_old, w_new, wall_ratio, s_old, s_new, shuf_ratio,
                     verdict))

    total_old = round(sum(r[1] for r in rows), 2)
    total_new = round(sum(r[2] for r in rows), 2)
    shuffle_old = round(sum(r[4] for r in rows if r[4] is not None), 1)
    shuffle_new = round(sum(r[5] for r in rows if r[5] is not None), 1)

    print(f"| query | wall_old | wall_new | ratio | shuf_old_mb | "
          f"shuf_new_mb | shuf_ratio | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: -(r[3] or 0))[:15]:
        print("| " + " | ".join(str(x) for x in r) + " |")

    plan_regressions = [
        r[0] for r in rows if r[6] is not None and r[6] > 1.2
        and (r[3] or 0) > 1.2 and (r[5] or 0) >= 4.0
    ]
    print()
    print(json.dumps({
        "wall_old_sec": total_old,
        "wall_new_sec": total_new,
        "wall_ratio": round(total_new / total_old, 3),
        "shuffle_old_mb": shuffle_old,
        "shuffle_new_mb": shuffle_new,
        "shuffle_ratio": round(shuffle_new / shuffle_old, 3),
        "n_queries": len(rows),
        "plan_regressions": plan_regressions,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

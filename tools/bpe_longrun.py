"""256-round BPE training endurance run (VERDICT r4 item 2 'done' bar).

Trains a 256-merge BPE table on the sf0.1 corpus with the production
knobs (localCheckpoint every 16 rounds, optional batch_m) and records
per-scan wall time.  The claim under test: per-round time stays FLAT —
the r4 implementation rebuilt an ever-deeper nested-regexp plan, so
analysis cost grew with round number and a real 30k-merge run would die
in the optimizer.

Usage: python tools/bpe_longrun.py [sf_dir] [n_merges] [batch_m] [unit]

``unit``: what counts as a "word" for the frequency vocabulary —
``word`` (whitespace tokens; the synthetic sf0.1 corpus has only 31
distinct, which saturates at ~89 merges) or ``trigram`` (adjacent
word triples joined with ``_`` — thousands of distinct entries, enough
signal to sustain 256+ merge rounds on the same corpus).
Writes BPE_LONGRUN.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    batch_m = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pyspark.sql import functions as F

    from psweep_spark.operators.text import (
        bpe_apply_merges,
        bpe_pair_counts,
        _select_disjoint,
    )
    from psweep_spark.session import get_spark

    spark = get_spark("bpe-longrun")
    unit = sys.argv[4] if len(sys.argv) > 4 else "word"
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = docs.select(F.split(F.trim("text"), r"\s+").alias("t"))
    if unit == "trigram":
        grams = toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size("t") - 3, F.lit(0)) - 1),
                    lambda i: F.concat_ws(
                        "_",
                        F.element_at(F.col("t"), i + 1),
                        F.element_at(F.col("t"), i + 2),
                        F.element_at(F.col("t"), i + 3),
                    ),
                )
            ).alias("w")
        )
    else:
        grams = toks.select(F.explode("t").alias("w"))
    words = (
        grams.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("s", F.concat_ws(" ", F.split("w", "")))
        .persist()
    )
    n_vocab = words.count()

    # inline bpe_train with per-scan timing (same code path/knobs)
    merges = []
    cur = words
    scan_times: list[float] = []
    scans_since_ckpt = 0
    checkpoint_every = 16
    while len(merges) < n_merges:
        t0 = time.perf_counter()
        want = min(batch_m, n_merges - len(merges))
        cands = (
            bpe_pair_counts(cur)
            .orderBy(F.desc("c"), "s1", "s2")
            .limit(4 * want + 4)
            .collect()
        )
        batch = _select_disjoint(cands, want)
        if not batch:
            break
        for a, b, c in batch:
            merges.append((len(merges) + 1, a, b, a + b, c))
        cur = bpe_apply_merges(cur, [(a, b) for a, b, _ in batch])
        scans_since_ckpt += 1
        if scans_since_ckpt >= checkpoint_every:
            cur = cur.localCheckpoint(eager=True)
            scans_since_ckpt = 0
        scan_times.append(time.perf_counter() - t0)
        if len(scan_times) % 32 == 0:
            print(
                f"scan {len(scan_times)}: merges={len(merges)} "
                f"last={scan_times[-1]:.3f}s",
                flush=True,
            )

    q = max(1, len(scan_times) // 4)
    first_q = sum(scan_times[:q]) / q
    last_q = sum(scan_times[-q:]) / q
    out = {
        "sf_dir": sf_dir,
        "unit": unit,
        "n_vocab": n_vocab,
        "n_merges": len(merges),
        "n_scans": len(scan_times),
        "batch_m": batch_m,
        "checkpoint_every": checkpoint_every,
        "total_sec": round(sum(scan_times), 2),
        "first_quartile_mean_sec": round(first_q, 4),
        "last_quartile_mean_sec": round(last_q, 4),
        "last_over_first": round(last_q / first_q, 3),
        "max_scan_sec": round(max(scan_times), 4),
        "scan_sec": [round(t, 4) for t in scan_times],
        "last_merges": merges[-5:],
    }
    path = os.path.join(REPO, "BPE_LONGRUN.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "scan_sec"}))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

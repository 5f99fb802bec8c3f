#!/bin/bash
# Round-11 gate battery — the multi-SF re-gate VERDICT r10 ordered
# (item 1): every corpus shape at the CURRENT tip, sequential (one
# Spark JVM at a time; the r9 parallel-gate JVM loss is why).
# Ordered so the r10-stale shapes (sf10 constructed — the artifact
# ADVICE r10 wrongly claimed existed — then skew/sf1/sf0.1) regenerate
# before the long sf10 broad sweep.  Artifacts land at the repo root.
set -x
cd /root/repo
export PSWEEP_SPARK_DRIVER_MEM=64g

python tools/check_correctness.py /root/testdata/sf0.01 \
  --json CORRECTNESS_FULL_r11.json > /tmp/r11_gate_sf001.log 2>&1

python tools/check_sf10_constructed.py > /tmp/r11_gate_sf10constructed.log 2>&1

python tools/check_correctness.py /root/repo/scale_data/skew_sf1 \
  --json CORRECTNESS_SKEW_r11.json --exclude \
  "dedup_clusters_exact=recursive closure over the same exact pair set (quadratic twin, skew-excluded by contract; CATALOG.md)" \
  "dedup_ngram_jaccard=exact shingle self-join oracle: 22 boilerplate shingles with df~10k make the intersection join materialize ~1e8+ rows in both engines (quadratic twin, skew-excluded by contract; CATALOG.md)" \
  > /tmp/r11_gate_skew.log 2>&1

python tools/check_correctness.py /root/repo/scale_data/sf1 \
  --json CORRECTNESS_FULL_SF1_r11.json > /tmp/r11_gate_sf1.log 2>&1

python tools/check_correctness.py /root/testdata/sf0.1 \
  --json CORRECTNESS_FULL_SF01_r11.json > /tmp/r11_gate_sf01.log 2>&1

python tools/check_correctness.py /root/repo/scale_data/sf10 \
  --json CORRECTNESS_SF10_BROAD_r11.json --exclude \
  "corpus_bpe_merges=list_reduce fold oracle; pure-python BPE construction" \
  "dedup_clusters=DuckDB recursive-CTE closure >20min; union-find construction" \
  "dedup_clusters_exact=recursive closure over the same exact pair set; constructed" \
  "dedup_clusters_star=same closure; construction" \
  "dedup_ngram_jaccard=quadratic exact-shingle oracle; closed by sf1-validated construction" \
  "embed_semdedup=quadratic pair truth; property oracle" \
  "embedding_near_dup=quadratic all-pairs truth; property oracle" \
  "semdedup_kmeans=quadratic pair truth; property oracle" \
  "semdedup_kmeans_scaled=DuckDB Lloyd CTE is 3x(N*k) cross join at k=448; numpy property oracle" \
  > /tmp/r11_gate_sf10broad.log 2>&1

echo GATES_DONE

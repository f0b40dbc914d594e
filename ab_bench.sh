#!/bin/bash
# Interleaved A/B timing: round-6 tree (/tmp/repo_r6) vs working tree.
# Usage: ab_bench.sh <queries-csv> <reps-per-leg> <sf-dir> <legs>
# Alternating legs cancel box-tenant drift; compare per-leg mins.
Q="$1"; REPS="${2:-2}"; SF="${3:-/root/testdata/sf1.0}"; LEGS="${4:-2}"
for i in $(seq 1 "$LEGS"); do
  echo "== leg $i OLD =="
  (cd /tmp/repo_r6 && python bench_extra.py --queries "$Q" --reps "$REPS" --sf-dir "$SF" 2>/dev/null)
  echo "== leg $i NEW =="
  (cd /root/repo && python bench_extra.py --queries "$Q" --reps "$REPS" --sf-dir "$SF" 2>/dev/null)
done

#!/bin/bash
# Whole-surface sf0.1 oracle replay: run after
#   sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v01"
# Replays every oracle in DuckDB at sf0.1 with a per-oracle timeout.
# Exclusions are the documented DuckDB-cost set: the 10 MinHash-replay
# oracles (all-pairs exact Jaccard over the full corpus) plus d24
# (d6's recursive-CTE transitive closure).
OUT=${1:-/tmp/v01}
SF=${2:-/root/testdata/sf0.1}
EXCL="d2_dedup_minhash_lsh d6_dedup_clusters d7_dedup_apply d11_keep_best d13_cluster_stats d20_soft_dedup p2_curate_neardup p3_curate_keepbest s13_stream_dedup_index d22_minhash_fidelity d24_cluster_purity d28_cc_bigstar"
names=$(python3 -c "
import json
o=json.load(open('$OUT/oracle_sql.json'))
excl=set('''$EXCL'''.split())
print('\n'.join(sorted(n for n in o if n not in excl)))")
pass=0; fail=0; to=0
for n in $names; do
  out=$(timeout 150 python3 "$(dirname "$0")/check_oracle.py" "$SF" "$OUT" --only "$n" --skip-missing 2>&1)
  rc=$?
  if [ $rc -eq 124 ]; then echo "TIMEOUT $n"; to=$((to+1))
  elif echo "$out" | grep -q "0 failed"; then pass=$((pass+1))
  else echo "$out" | grep -E "FAIL|ROWS-ONLY" | head -2; fail=$((fail+1)); fi
done
echo "REPLAY SUMMARY: pass=$pass fail=$fail timeout=$to"

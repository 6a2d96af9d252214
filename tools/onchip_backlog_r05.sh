#!/bin/bash
# Round-5 on-chip validation backlog (VERDICT r4 #10: every on-chip claim
# gets a jsonl entry with command, timestamp, parsed result).
# Each tool runs under its own timeout; its final JSON line is appended to
# $OUT so results survive a mid-sequence tunnel death. Order: cheapest /
# most-critical first; the quality gate (resumable, tools/quality_gate.py)
# last — rerun this script to resume it after a tunnel death.
set -u
cd /root/repo
OUT=${1:-/root/repo/ONCHIP_r05.jsonl}
ERR="$OUT.err"
TMP=$(mktemp)

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) $(date -u +%FT%TZ) ===" | tee -a "$ERR"
  timeout "$tmo" "$@" >"$TMP" 2>>"$ERR"
  local rc=$?
  local line
  line=$(tail -1 "$TMP")
  if [ -n "$line" ] && echo "$line" | python -c "import json,sys; json.loads(sys.stdin.read())" 2>/dev/null; then
    echo "{\"step\": \"$name\", \"rc\": $rc, \"ts\": \"$(date -u +%FT%TZ)\", \"result\": $line}" >> "$OUT"
  else
    echo "{\"step\": \"$name\", \"rc\": $rc, \"ts\": \"$(date -u +%FT%TZ)\", \"result\": null}" >> "$OUT"
  fi
  echo "--- $name rc=$rc: $line"
}

# 1. numerical parity of the round-5 kernels — MUST pass before anything
run tpu_parity_check 900 python tools/tpu_parity_check.py
# 2. headline bench (staged: writes the small result first)
run bench 960 env BENCH_BUDGET_S=900 python bench.py
# 3. chained-program device profile (the throughput evidence)
run profile_chain 700 python tools/profile_chain.py 30
# 4. mapping-step profile at map scale
run profile_map 1200 python tools/profile_map.py
# 5. sharded FULL backward vs unsharded on the real chip (VERDICT r4 #5)
run mosaic_shard_check 1200 python tools/mosaic_shard_check.py
# 6. pose-refinement iteration rate
run bench_pose 700 python bench_pose.py
# 7. reference-scale eval rehearsal (VERDICT r4 #8 + per-query latency #4)
run eval_rehearsal 1800 python tools/eval_rehearsal.py 100
# 8. full-scale synthetic quality gate (resumable; rerun to resume)
run quality_gate 3000 python tools/quality_gate.py
rm -f "$TMP"
echo "backlog complete -> $OUT"

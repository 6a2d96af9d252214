#!/bin/bash
# Round-3 on-chip validation backlog (VERDICT r2 "Next round" #1/#2/#3).
# Run the moment the axon tunnel is alive (tools/tunnel_poll.sh exits 0).
# Each tool runs under its own timeout; its final JSON line is appended to
# $OUT so results survive a mid-sequence tunnel death. Order matters:
# cheapest/most-critical first, the 16-min quality gate last.
set -u
cd /root/repo
OUT=${1:-/root/repo/ONCHIP_r03.jsonl}
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

# 1. the bf16-limb-split parity check — MUST pass before anything else
run tpu_parity_check 900 python tools/tpu_parity_check.py
# 2. headline bench (staged: writes the small result first)
run bench 960 env BENCH_BUDGET_S=900 python bench.py
# 3. segscan Mosaic validation (flip SEGSCAN_MODE on ok)
run segscan_check 1500 python tools/segscan_onchip_check.py
# 4. device-trace op breakdown of the bench program
run profile_bench 900 python tools/profile_bench.py
# 5. mapping-step profile at map scale (pack-gather anomaly numbers)
run profile_map 1200 python tools/profile_map.py
# 6. shard_map+Pallas Mosaic compile on the real chip (1-device mesh)
run mosaic_shard_check 900 python tools/mosaic_shard_check.py
# 7. full-scale synthetic quality gate (~16 min)
run quality_gate 2400 python tools/quality_gate.py
rm -f "$TMP"
echo "backlog complete -> $OUT"

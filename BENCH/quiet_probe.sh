#!/bin/bash
# Fire one pinned local[32] 32M-event replay trial only when the host is
# genuinely quiet (1-min load < 2.0), so the 32-core level gets at least one
# uncontended measurement to pair with the reproducible local[8] number.
# Appends JSON lines {load_before, load_after, result...} to quiet32.jsonl.
OUT=/root/repo/BENCH/quiet32.jsonl
for i in $(seq 1 60); do
  L1=$(awk '{print $1}' /proc/loadavg)
  if awk "BEGIN{exit !($L1 < 2.0)}"; then
    SCALING_TRIALS=1 python - <<'EOF'
import sys, json, importlib.util
spec = importlib.util.spec_from_file_location("sr", "/root/repo/BENCH/scaling_run.py")
sr = importlib.util.module_from_spec(spec); spec.loader.exec_module(sr)
lb = open("/proc/loadavg").read().split()[0]
r = sr.run_level("/root/repo", 32, 32_000_000)
la = open("/proc/loadavg").read().split()[0]
r["load_before"], r["load_after"] = float(lb), float(la)
with open("/root/repo/BENCH/quiet32.jsonl", "a") as fh:
    fh.write(json.dumps(r) + "\n")
EOF
    # stop once we have a trial whose whole window was quiet
    if [ -f "$OUT" ] && python - <<'EOF'
import json, sys
rows = [json.loads(l) for l in open("/root/repo/BENCH/quiet32.jsonl")]
ok = any(r["wall"] < 100 for r in rows)  # uncontended-signature wall; load_after is polluted by the trial itself
sys.exit(0 if ok else 1)
EOF
    then
      echo "quiet trial captured"; exit 0
    fi
  fi
  sleep 240
done
echo "no quiet window found"

#!/bin/bash
# Launch the full-suite bench only after a sustained calm window, and
# accept the artifact only if the run's reference queries stayed within
# sane ratios of their committed values (i.e. the host stayed calm for
# the duration). Loops until an accepted artifact exists.
#
# Usage: tools/bench_when_calm.sh OUT.json
# Writes progress lines to stdout; run under nohup and tail the log.
set -u
cd "$(dirname "$0")/.."
OUT="${1:?usage: bench_when_calm.sh OUT.json (e.g. BENCH_r17_honest.json)}"

attempt=0
while true; do
  # require two consecutive calm 60s windows before launching
  if ! python3 tools/host_calm.py 60 1.5; then
    sleep 120
    continue
  fi
  if ! python3 tools/host_calm.py 60 1.5; then
    sleep 120
    continue
  fi
  attempt=$((attempt + 1))
  echo "=== attempt $attempt: launching bench $(date -u +%H:%M:%S)"
  rm -f "$OUT" "$OUT.tmp"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="$OUT" sbt -batch "runMain graft.Bench" \
    > "/tmp/bench_attempt_$attempt.log" 2>&1
  rc=$?
  echo "=== attempt $attempt: bench exited rc=$rc $(date -u +%H:%M:%S)"
  python3 - "$OUT" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
except Exception as e:
    sys.exit(f"no artifact: {e}")
if d.get("partial"):
    sys.exit("artifact still partial (run died)")
q = d["queries"]
# committed round-7 calm-phase anchors; accept within 2x
anchors = {"d7_dup_components": 3.07, "c3_decontaminate": 1.04,
           "j3_join_chain": 0.52}
bad = [f"{k}={q[k]:.2f} (anchor {v}, ratio {q[k]/v:.1f}x)"
       for k, v in anchors.items() if k in q and q[k] > 2 * v]
nq = sum(1 for k in q if not k.startswith("_"))
print(f"total {d['value']} across {nq} queries "
      f"(+{len(q) - nq} harness entries); errors={d['errors']}")
if bad:
    sys.exit("throttled run, rejecting: " + "; ".join(bad))
if d["errors"]:
    sys.exit("run had errors, rejecting")
print("ACCEPTED")
EOF
  if [ $? -eq 0 ]; then
    echo "=== accepted artifact $OUT after attempt $attempt"
    break
  fi
  echo "=== attempt $attempt rejected; waiting for the next calm window"
done

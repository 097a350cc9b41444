#!/bin/bash
# 2-run correctness stability smoke: any row that flips between two
# fresh-JVM Verify+check runs is a determinism bug by definition.
# Usage: dev/stability.sh [sf_dir] [log_file]
set -u
SF=${1:-/root/testdata/sf0.01}
LOG=${2:-dev/STABILITY.log}
cd "$(dirname "$0")/.."
: > "$LOG"
for i in 1 2; do
  out=/tmp/graft_stab_$i
  rm -rf "$out"
  echo "== run $i ($(date -u +%FT%TZ)) ==" >> "$LOG"
  sbt -batch "runMain graft.Verify $SF $out" > /tmp/graft_stab_verify_$i.log 2>&1 \
    || { echo "VERIFY FAILED run $i" >> "$LOG"; exit 1; }
  python3 dev/check.py "$SF" "$out" | tail -1 >> "$LOG"
  python3 dev/check.py "$SF" "$out" | grep -c '^PASS' | sed 's/^/pass_rows /' >> "$LOG"
done
if grep -q FAILURES "$LOG"; then echo "UNSTABLE OR RED" >> "$LOG"; exit 1; fi
echo "STABLE: both fresh-JVM runs ALL GREEN" >> "$LOG"
cat "$LOG"

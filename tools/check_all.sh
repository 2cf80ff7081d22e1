#!/bin/bash
# Full local gate: compile → tests → verify+oracle (sf0.01) → bench (sf0.1).
# Mirrors the driver's per-round checks; exits non-zero on any failure.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== compile + test ==="
test_log=$(mktemp)
if ! sbt -batch test > "$test_log" 2>&1; then
  grep -E 'Tests:|\*\*\* FAILED|\[error\]' "$test_log" | tail -20
  echo "FAIL: sbt test"
  exit 1
fi
grep -E 'Tests:' "$test_log" | tail -1

echo "=== verify @ sf0.01 ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/check_verify" \
  > /tmp/check_verify.log 2>&1
grep -E '\[verify\]' /tmp/check_verify.log || true
python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/check_verify | tail -3

echo "=== bench @ sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  2>&1 | grep -oE '\{"metric".*\}$' | tee /tmp/check_bench.json | python3 -c "
import sys, json
d = json.loads(sys.stdin.read())
errs = d.get('errors') or {}
if errs:
    print('BENCH FAILURES:', json.dumps(errs)); sys.exit(1)
print('total %.1fs over %d queries' % (d['value'], len(d['queries'])))"
echo "ALL GREEN"

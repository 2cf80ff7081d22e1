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

echo "=== scenario-set regression vs latest CORRECTNESS artifact ==="
# round 7 regressed 21 scenarios invisibly: queries that crash produce
# no output dir, and a correctness artifact built from the survivors
# still reads "0 mismatches". Fail if any scenario present in the most
# recent CORRECTNESS_r*.json is absent from this run's output set.
python3 - <<'EOF'
import glob, json, os, sys
arts = sorted(glob.glob('CORRECTNESS_r*.json'))
if not arts:
    print('no prior CORRECTNESS artifact; skipping diff'); sys.exit(0)
prior = set(json.load(open(arts[-1])).keys())
now = {os.path.basename(p) for p in glob.glob('/tmp/check_verify/*') if os.path.isdir(p)}
missing = sorted(prior - now)
if missing:
    print(f'FAIL: {len(missing)} scenario(s) in {arts[-1]} missing from this run: {missing}')
    sys.exit(1)
print(f'ok: all {len(prior)} scenarios from {arts[-1]} present ({len(now)} total now)')
EOF

echo "=== bench @ sf0.1 ==="
# ONE round-number derivation for the whole gate (round-11 ADVICE):
# computed here, passed to Bench (which writes BENCH_r{N}_full.json)
# and reused by the sync assert below — the two can no longer drift.
GRAFT_ROUND=$(python3 - <<'EOF'
import glob, re
rounds = [int(m.group(1)) for p in glob.glob('BENCH_r[0-9]*.json')
          if (m := re.match(r'BENCH_r(\d+)\.json$', p))]
print(max(rounds) + 1 if rounds else 1)
EOF
)
echo "round: $GRAFT_ROUND"
SPARK_GRAFT_ROUND=$GRAFT_ROUND SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" \
  2>&1 | grep -oE '\{"metric".*\}$' > /tmp/check_bench.json
python3 - <<'EOF'
import json
line = open('/tmp/check_bench.json').read().strip()
# the stdout line must FIT the driver's 2000-char tail or the round
# artifact records parsed:null (the r8 failure mode)
assert len(line) <= 1900, f'compact bench line too long: {len(line)} chars'
d = json.loads(line)
errs = d.get('errors') or {}
if errs:
    raise SystemExit('BENCH FAILURES: ' + json.dumps(errs))
# the complete per-query map must exist in BENCH_full_latest.json and
# cover the whole suite
f = json.loads(open('BENCH_full_latest.json').read())
assert len(f['queries']) == f['n_queries'] == d['n_queries'], 'full artifact incomplete'
print('total %.1fs over %d queries (compact line %d chars, lists %d, omitted_max %.3fs)' % (
    d['value'], d['n_queries'], len(line), len(d['queries']), d['omitted_max']))
EOF

echo "=== round-named full bench artifact in sync ==="
# graft.Bench itself writes BENCH_r{N}_full.json alongside
# BENCH_full_latest.json on every full-suite run (same run, so the pair
# cannot de-sync — round-10 verdict #2: the old mid-gate copy went stale
# when a later bench re-ran). This step ASSERTS the three artifacts
# carry the same run: n_queries AND total value.
GRAFT_ROUND=$GRAFT_ROUND python3 - <<'EOF'
import json, os
n = int(os.environ['GRAFT_ROUND'])  # the gate's ONE derivation, above
full = json.load(open('BENCH_full_latest.json'))
rn = json.load(open(f'BENCH_r{n:02d}_full.json'))
compact = json.load(open('/tmp/check_bench.json'))
assert full['n_queries'] == compact['n_queries'] == rn['n_queries'] == len(full['queries']), \
    f"bench artifacts disagree on count: full={full['n_queries']} round={rn['n_queries']} compact={compact['n_queries']}"
assert full['value'] == rn['value'] == compact['value'], \
    f"bench artifacts carry different runs: full={full['value']} round={rn['value']} compact={compact['value']}"
print(f"in sync: BENCH_r{n:02d}_full.json == BENCH_full_latest.json "
      f"({full['n_queries']} queries, total {full['value']:.1f}s)")
EOF
echo "ALL GREEN"

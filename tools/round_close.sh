#!/usr/bin/env bash
# Round-close oracle gate (r9, VERDICT r8 task 2).
#
# The r8 post-mortem: the fragility guard ran against a PRE-commit
# oracle dump, so two flagged oracles shipped anyway. This script
# regenerates the dump FROM HEAD and gates on it — run it as the last
# step before the round-close commit; a nonzero exit means the commit
# ships a known-fragile or type-unstable oracle.
#
# Usage: tools/round_close.sh [sfDir] [outDir]
set -u
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT="${2:-/tmp/round_close_dump}"
rc=0

echo "== round_close: guard selftests =="
python3 tools/oracle_fragility_guard.py --selftest || rc=1

echo "== round_close: Verify @ $SF -> $OUT (fresh dump from HEAD) =="
rm -rf "$OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep '\[verify\]' && rc=1
[ -f "$OUT/oracle_sql.json" ] || { echo "FATAL: no oracle_sql.json"; exit 1; }

# each tool runs ONCE; the displayed lines and the gated line come from
# the same captured output (r10 — the double-run both doubled the gate's
# slowest step and let display and gate diverge under nondeterminism)
echo "== round_close: value compare (DuckDB) =="
cmp_out=$(python3 tools/local_compare.py "$SF" "$OUT")
echo "$cmp_out" | tail -3
echo "$cmp_out" | tail -1 | grep -q '^0 failures' || rc=1

echo "== round_close: oracle type guard =="
type_out=$(python3 tools/oracle_type_guard.py "$SF" "$OUT")
echo "$type_out" | tail -2
echo "$type_out" | tail -1 | grep -q 'VIOLATIONS: 0' || rc=1

echo "== round_close: oracle fragility guard =="
frag_out=$(python3 tools/oracle_fragility_guard.py "$OUT")
echo "$frag_out" | tail -2
echo "$frag_out" | tail -1 | grep -q 'VIOLATIONS: 0' || rc=1

if [ "$rc" -eq 0 ]; then echo "ROUND-CLOSE GATE: PASS"; else
  echo "ROUND-CLOSE GATE: FAIL (do not commit the round close)"; fi
exit "$rc"

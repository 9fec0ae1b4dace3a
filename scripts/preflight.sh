#!/usr/bin/env bash
# Pre-snapshot gate: run before ending a round so the round's artifacts
# (BENCH_r{N}.json, CORRECTNESS_r{N}.json) can't be produced from a
# tree that doesn't compile or whose entrypoint is broken. Round 5
# shipped a bench with rc=1 from a one-line compile break — this is
# the guard against repeating that.
#
#   ./scripts/preflight.sh            # compile (main+test) + smoke query
#   ./scripts/preflight.sh --full     # also: full test suite + sf0.01 oracle
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[preflight] sbt Test/compile"
sbt -batch "Test/compile" >/tmp/preflight_compile.log 2>&1 || {
  echo "[preflight] COMPILE FAILED — tail of log:"; tail -30 /tmp/preflight_compile.log; exit 1; }

echo "[preflight] smoke: Verify on sf0.001 (entry + every query end-to-end)"
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/preflight_out" \
  >/tmp/preflight_verify.log 2>&1 || {
  echo "[preflight] VERIFY FAILED — tail of log:"; tail -30 /tmp/preflight_verify.log; exit 1; }
if grep -q "\[verify\].*failed" /tmp/preflight_verify.log; then
  echo "[preflight] QUERY FAILURES:"; grep "\[verify\].*failed" /tmp/preflight_verify.log; exit 1
fi

if [[ "${1:-}" == "--full" ]]; then
  echo "[preflight] full: sbt test"
  sbt -batch test >/tmp/preflight_test.log 2>&1 || {
    echo "[preflight] TESTS FAILED — tail of log:"; tail -40 /tmp/preflight_test.log; exit 1; }
  echo "[preflight] full: sf0.01 oracle compare"
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/preflight_out01" \
    >/tmp/preflight_verify01.log 2>&1
  python3 scripts/check.py /root/testdata/sf0.01 /tmp/preflight_out01
fi

echo "[preflight] OK"

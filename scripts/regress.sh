#!/bin/bash
# Round-over-round regression battery: canonical CLI rows vs the
# committed expectation table, one PASS/FAIL JSON (VERDICT r4 item 7).
# Runs on the real chip; retries once on a wedged tunnel (CLAUDE.md).
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
for i in 1 2; do
  timeout 2400 python scripts/regress.py "$@" && exit 0
  code=$?
  [ $code -eq 1 ] && exit 1   # genuine FAIL verdict: do not retry
  echo "regress: retry $i (exit $code)"
done
exit 2

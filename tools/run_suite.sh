#!/bin/bash
# Full-suite runner: one pytest process per test file (a monolithic run
# segfaults XLA:CPU reproducibly after ~150 tests — accumulated compile
# state; per-file processes sidestep it).  Usage: run_suite.sh [marker]
cd /root/repo
M=${1:-""}
PASS=0; FAIL=0; FAILED=""
START=$(date +%s)
for f in tests/test_*.py; do
  out=$(JAX_PLATFORMS=cpu timeout 3000 python -m pytest "$f" -q -m "$M" 2>&1 | tail -1)
  echo "$f: $out"
  case "$out" in
    *failed*|*error*) FAIL=$((FAIL+1)); FAILED="$FAILED $f";;
    *) PASS=$((PASS+1));;
  esac
done
echo "files ok: $PASS, files with failures: $FAIL ($FAILED)"
echo "wall: $((($(date +%s)-START)/60)) min"

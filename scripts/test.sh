#!/usr/bin/env bash
# One-command full-suite runner (VERDICT round-4 weak #1 / item 5).
#
# `pytest tests/ -q` in a single process accumulates ~150 XLA-compiled
# programs and segfaults inside XLA CPU compilation around test #140
# (jax/_src/compiler.py backend_compile_and_load) — every test passes when
# its file runs in a fresh process.  So the quality gate is: one pytest
# process PER TEST FILE, results aggregated, nonzero exit on any failure.
#
# Usage: scripts/test.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."

files=(tests/test_*.py)
total_pass=0
total_fail=0
failed_files=()
t0=$SECONDS

for f in "${files[@]}"; do
  out=$(python -m pytest "$f" -q --no-header -p no:cacheprovider "$@" 2>&1)
  rc=$?
  # last summary line looks like: "12 passed in 34.56s" or "1 failed, ..."
  summary=$(echo "$out" | grep -E '[0-9]+ (passed|failed|error)' | tail -1)
  npass=$(echo "$summary" | grep -oE '[0-9]+ passed' | grep -oE '[0-9]+')
  nfail=0
  for k in $(echo "$summary" | grep -oE '[0-9]+ (failed|error)' \
             | grep -oE '[0-9]+'); do
    nfail=$((nfail + k))
  done
  total_pass=$((total_pass + ${npass:-0}))
  total_fail=$((total_fail + nfail))
  if [ $rc -ne 0 ]; then
    failed_files+=("$f")
    echo "FAIL $f (rc=$rc): $summary"
    echo "$out" | tail -40
  else
    echo "ok   $f: $summary"
  fi
done

echo "----------------------------------------------------------------"
echo "TOTAL: $total_pass passed, $total_fail failed in $((SECONDS - t0))s"
if [ ${#failed_files[@]} -ne 0 ]; then
  echo "failed files: ${failed_files[*]}"
  exit 1
fi
exit 0

#!/bin/bash
# Resilient test-suite runner.
#
# XLA:CPU's LLVM codegen crashes flakily (SIGABRT/SIGSEGV, ~once per few
# hundred compiles) in both the compile and the cache-deserialize paths on
# this single-core host; one crash kills the whole pytest process. Running
# each test file in its own process and retrying crashed files up to
# MAX_RETRY times bounds the blast radius to one file, and the persistent
# compilation cache (tests/conftest.py) makes retries cheap.
#
# Usage: tools/run_tests.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
MAX_RETRY=${MAX_RETRY:-2}
# Fast tier by default: full-size gates are marked `slow` and re-run the
# SAME gate math at larger scale — include them with RUN_SLOW=1 (nightly
# posture). The fast tier covers every gate's logic in minutes.
MARKER_ARGS=(-m "not slow")
[ "${RUN_SLOW:-0}" = "1" ] && MARKER_ARGS=()
fail_files=()
crash_files=()
for f in tests/test_*.py; do
  ok=0
  for attempt in $(seq 0 "$MAX_RETRY"); do
    python -m pytest "$f" -q -p no:cacheprovider "${MARKER_ARGS[@]}" "$@"
    rc=$?
    if [ "$rc" -eq 5 ] && [ "${#MARKER_ARGS[@]}" -gt 0 ]; then
      # rc=5 = "no tests collected" under the fast tier's marker filter.
      # Legitimate ONLY for an all-slow file (e.g. test_distributed.py);
      # verify the file collects tests WITHOUT the filter so a collection
      # regression (typo'd names, import-level skip wiping the file) cannot
      # read as green (ADVICE r4).
      if python -m pytest "$f" -q -p no:cacheprovider --collect-only >/dev/null 2>&1; then
        ok=1
        break
      fi
      echo "rc=5 in $f but unfiltered collection finds no tests either — failing" >&2
      rc=1
      break
    fi
    if [ "$rc" -eq 0 ]; then
      ok=1
      break
    elif [ "$rc" -eq 130 ] || [ "$rc" -eq 2 ]; then
      # SIGINT / keyboard interrupt: the user wants OUT, not a retry.
      echo "Interrupted (rc=$rc) in $f — aborting" >&2
      exit 130
    elif [ "$rc" -ge 128 ] || [ "$rc" -eq 134 ] || [ "$rc" -eq 139 ]; then
      echo "CRASH rc=$rc in $f (attempt $attempt)" >&2
    else
      # genuine test failure: no point retrying
      break
    fi
  done
  if [ "$ok" -ne 1 ]; then
    if [ "${rc:-1}" -ge 128 ]; then crash_files+=("$f"); else fail_files+=("$f"); fi
  fi
done
echo "================================================================"
if [ "${#fail_files[@]}" -eq 0 ] && [ "${#crash_files[@]}" -eq 0 ]; then
  echo "SUITE GREEN"
  exit 0
fi
[ "${#fail_files[@]}" -gt 0 ] && echo "FAILED: ${fail_files[*]}"
[ "${#crash_files[@]}" -gt 0 ] && echo "CRASHED (after retries): ${crash_files[*]}"
exit 1

#!/usr/bin/env bash
# One-command release gate (verdict r4 item 7): every check the driver
# or judge runs, locally, failing on any red — so a round never depends
# on the driver's 50-query window to discover catalog drift.
#
#   tools/ci.sh           # full gate: dtypes + full-catalog oracle +
#                         # pytest + bench (at $SPARK_GRAFT_SF_DIR,
#                         # default sf0.1)
#   tools/ci.sh --fast    # skip bench (the slow step) — the correctness
#                         # gate alone
#
# Steps:
#   1. tools/dtypecheck.py — DuckDB output-type lint over all oracles;
#      catches the HUGEINT class (the only red driver rows in rounds
#      1-4) without running Spark at all.
#   2. tools/selfcheck.py  — the driver's oracle gate, FULL catalog at
#      sf0.01 (the driver samples 50; this runs all of them).
#   3. pytest tests/       — the unit/property suite.
#   4. bench.py            — headline timings; fails only on non-zero
#      exit (trend regressions are reported in the JSON, not fatal).
set -u
cd "$(dirname "$0")/.."

fast=0
[ "${1:-}" = "--fast" ] && fast=1

fail=0
step() {
  echo "== ci: $1"
  shift
  "$@" || { echo "== ci: FAILED: $1"; fail=1; }
}

step "oracle output dtypes (HUGEINT lint)" python tools/dtypecheck.py
step "full-catalog oracle gate (sf0.01)" python tools/selfcheck.py /root/testdata/sf0.01
# CI runs the FULL suite including @pytest.mark.slow end-to-end tests;
# a bare `pytest tests/` skips them so the driver's bounded verify
# window completes (r13, verdict r12 item 2)
step "pytest (full, incl. slow)" env CCMS_FULL_TESTS=1 python -m pytest tests/ -x -q
if [ "$fast" = 0 ]; then
  step "bench" python bench.py
fi

if [ "$fail" = 0 ]; then
  echo "== ci: ALL GREEN"
else
  echo "== ci: RED"
fi

# Record the gate's verdict in PROGRESS.jsonl (verdict r5 item 8): every
# commit batch runs this gate first, so the driver's 50-query window is
# never the first place a red appears. Lines carry a distinguishing
# "ci" key; the driver's own progress lines are untouched.
mode=full; [ "$fast" = 1 ] && mode=fast
python - "$fail" "$mode" <<'PYEOF'
import json, subprocess, sys, time
fail, mode = sys.argv[1], sys.argv[2]
head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                      capture_output=True, text=True).stdout.strip()
with open("PROGRESS.jsonl", "a") as fh:
    fh.write(json.dumps({"ts": round(time.time(), 3),
                         "ci": "pass" if fail == "0" else "fail",
                         "mode": mode, "head": head}) + "\n")
PYEOF

exit $fail

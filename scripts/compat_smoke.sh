#!/bin/sh
# Whole-registry stock-conf smoke, run ONCE PER ROUND before the closing
# bench (round-6 verdict task #5). Executes every registry query under a
# stock-default SparkSession (tests/test_default_session_compat.py's
# opt-in SPARK_GRAFT_FULL_COMPAT block) so a stock-conf behavior change
# (the round-4 TIMESTAMP_NTZ class) is caught before any driver run.
# Appends one timestamped result line per run to scripts/COMPAT_SMOKE.log
# — the recorded green run the round checklist requires.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/COMPAT_SMOKE.log
TMP=$(mktemp)
SPARK_GRAFT_FULL_COMPAT=1 python -m pytest \
    tests/test_default_session_compat.py -q --no-header >"$TMP" 2>&1
RC=$?
TAIL=$(grep -E "passed|failed|error" "$TMP" | tail -1)
echo "$(date -u +%Y-%m-%dT%H:%M:%SZ) rc=$RC $TAIL" >>"$LOG"
if [ $RC -ne 0 ]; then
    tail -50 "$TMP"
fi
rm -f "$TMP"
echo "compat smoke rc=$RC: $TAIL (logged to $LOG)"
exit $RC

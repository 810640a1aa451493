#!/usr/bin/env bash
# Close gate — the end-of-round snapshot must be the *last green* tree, not
# the *last edited* tree (VERDICT r12 "What's wrong" #2). Run this before the
# final commit of a round; the snapshot commit message records the chain it
# passed.
#
# Chain: compile → test → Verify+oracle @ sf0.01 → Verify+oracle @ sf0.1
#        → full 3-rep bench @ sf0.1 → summary line.
#
# Usage: bash scripts/close_gate.sh <round> [--skip-test] [--skip-sf01]
#   round        round number, used to name artifacts (bench_local_r<N>_full.json)
#   --skip-test  reuse an `sbt test` run already green on THIS tree (log path
#                must be stated in the snapshot commit message)
#   --skip-sf01  skip the sf0.1 verify sweep (bench still runs at sf0.1)
#
# Exits non-zero at the FIRST red step; artifacts from completed steps are
# left in place so a re-run can resume with the skip flags.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: close_gate.sh <round> [--skip-test] [--skip-sf01]}"
shift || true
SKIP_TEST=0; SKIP_SF01=0
for a in "$@"; do
  case "$a" in
    --skip-test) SKIP_TEST=1 ;;
    --skip-sf01) SKIP_SF01=1 ;;
    *) echo "unknown flag: $a" >&2; exit 2 ;;
  esac
done

STAMP() { date -u +%H:%M:%S; }
echo "[$(STAMP)] close_gate round=$ROUND"

echo "[$(STAMP)] 1/5 compile"
sbt -batch compile < /dev/null

if [ "$SKIP_TEST" = 1 ]; then
  echo "[$(STAMP)] 2/5 test SKIPPED (--skip-test; prior green run on this tree)"
else
  echo "[$(STAMP)] 2/5 test"
  sbt -batch test < /dev/null
fi

echo "[$(STAMP)] 3/5 verify+oracle sf0.01"
rm -rf /tmp/verify_close_sf001
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_close_sf001" < /dev/null
python3 scripts/oracle_type_lint.py /root/testdata/sf0.01 /tmp/verify_close_sf001/oracle_sql.json
python3 scripts/oracle_check.py /root/testdata/sf0.01 /tmp/verify_close_sf001

if [ "$SKIP_SF01" = 1 ]; then
  echo "[$(STAMP)] 4/5 verify+oracle sf0.1 SKIPPED (--skip-sf01)"
else
  echo "[$(STAMP)] 4/5 verify+oracle sf0.1"
  rm -rf /tmp/verify_close_sf01
  SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_close_sf01" < /dev/null
  python3 scripts/oracle_check.py /root/testdata/sf0.1 /tmp/verify_close_sf01
fi

echo "[$(STAMP)] 5/5 full bench sf0.1 → bench_local_r${ROUND}_full.json"
# Pin the retry pass's comparison set EXPLICITLY to the newest committed
# bench of a round strictly below this one (r14 verdict advisory #2: the
# in-dir fallback is for the driver's run; the close gate states its
# previous round so the comparison can never self-shadow).
# (sed+awk kept POSIX: gawk's 3-arg match() is absent on this box, and
# under set -e a failing substitution kills the whole gate — r15 lesson)
PREV_BENCH=$(ls bench_local_r*_full.json 2>/dev/null \
  | sed -n 's/^bench_local_r\([0-9][0-9]*\).*_full\.json$/\1 &/p' \
  | awk -v r="$ROUND" '$1 + 0 < r + 0' | sort -n | tail -1 | cut -d' ' -f2; true)
if [ -n "${PREV_BENCH:-}" ]; then
  echo "[$(STAMP)]   retry-pass prev bench: $PREV_BENCH"
  export SPARK_GRAFT_PREV_BENCH="$PREV_BENCH"
fi
# grep -o: sbt may prefix the line with [info], so anchor on the payload
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" < /dev/null \
  | grep -o '{"metric".*' | tail -1 > "bench_local_r${ROUND}_full.json"
cp "bench_local_r${ROUND}_full.json" bench_out.json
python3 - "bench_local_r${ROUND}_full.json" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"bench: {len(d['queries'])} queries, sum_medians={sum(d['queries'].values()):.1f}s, failed={d.get('failed', [])}")
assert not d.get("failed"), "bench had failures"
PY

echo "[$(STAMP)] CLOSE GATE GREEN: compile+test+verify(sf0.01$( [ "$SKIP_SF01" = 1 ] || echo ,sf0.1 ))+bench r${ROUND}"

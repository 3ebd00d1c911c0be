#!/bin/bash
# Round-15 gauge-first clean-window campaign.
# Polls the two x10 gauges + the sf0.1 stream_upsert canary; when the
# window is clean (triangles <= 23.5, winnow <= 2.0, upsert <= 2.0)
# runs, in one contiguous window:
#   1. interleaved sim_knn_lsh_clustered x10: NEW (HEAD) vs OLD
#      (r14-final binary frozen in /root/scratch/r14tree) — the
#      third/fourth clean samples for the re-based 27–45 band and the
#      regression check on this round's kernel codegen
#   2. mid gauge
#   3. the full HEAD bench (sf0.1 suite + stream lane + x10 lane,
#      crash-safe artifact -> bench_last.json)
#   4. x100 triangles anchor at 32g (third gauge-bracketed sample)
#   5. closing gauge
# usage: scripts/campaign_r15.sh [max_polls] [sleep_sec] [steps]
#   steps: substring filter, e.g. "lsh,bench,x100" (default all)
set -u
cd /root/repo
export SPARK_LOCAL_DIRS=/dev/shm/sparktmp
mkdir -p "$SPARK_LOCAL_DIRS"
LOG=${CAMPAIGN_LOG:-/root/repo/.tmp/campaign_r15.log}
MAX=${1:-40}
SLEEP=${2:-240}
STEPS=${3:-lsh,bench,x100}
X10=/root/scratch/x10
X100=/root/scratch/x100
SF=/root/testdata/sf0.1
OLD=/tmp/tools_run_r14.sh

say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

gauge() {
  local g u
  g=$(./tools_run.sh graft.tools.TimeQuery $X10 q_triangles text_winnow 2>/dev/null)
  u=$(./tools_run.sh graft.tools.TimeQuery $SF stream_upsert 2>/dev/null)
  echo "$(echo "$g" | awk '/q_triangles/{print $2}') $(echo "$g" | awk '/text_winnow/{print $2}') $(echo "$u" | awk '/stream_upsert/{print $2}')"
}

ok=0
for i in $(seq 1 $MAX); do
  read tri win ups <<< "$(gauge)"
  say "poll $i: tri=$tri win=$win ups=$ups"
  if awk -v t="$tri" -v w="$win" -v u="$ups" 'BEGIN{exit !(t<=23.5 && w<=2.0 && u<=2.0)}'; then
    ok=1; break
  fi
  sleep $SLEEP
done
if [ $ok -ne 1 ]; then say "NO clean window in $MAX polls"; exit 1; fi
say "CLEAN window — starting campaign (steps: $STEPS)"

if [[ $STEPS == *lsh* ]]; then
  say "lsh NEW:  $(./tools_run.sh graft.tools.TimeQuery $X10 sim_knn_lsh_clustered 2>/dev/null | tail -1)"
  say "lsh OLD:  $($OLD graft.tools.TimeQuery $X10 sim_knn_lsh_clustered 2>/dev/null | tail -1)"
  say "lsh NEW2: $(./tools_run.sh graft.tools.TimeQuery $X10 sim_knn_lsh_clustered 2>/dev/null | tail -1)"
  say "mid gauge: $(gauge)"
fi

if [[ $STEPS == *bench* ]]; then
  say "full bench starting"
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 ./tools_run.sh graft.Bench > /root/repo/.tmp/bench_r15_stdout.txt 2>/root/repo/.tmp/bench_r15_stderr.txt
  say "full bench rc=$? (json tail: $(tail -c 300 /root/repo/.tmp/bench_r15_stdout.txt))"
  say "post-bench gauge: $(gauge)"
fi

if [[ $STEPS == *x100* ]]; then
  say "x100 triangles starting (32g, cold single run)"
  GRAFT_TIME_ONCE=1 ./tools_run.sh -m32g graft.tools.TimeQuery $X100 q_triangles 2>/dev/null | tail -1 | tee -a "$LOG"
  say "closing gauge: $(gauge)"
fi
say "campaign done"

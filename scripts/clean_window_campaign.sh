#!/bin/bash
# Gauge-first clean-window bench campaign (round-14 verdict task 1).
# Polls the two x10 window gauges; when the window is clean
# (q_triangles <= 23.5 s AND text_winnow <= 2.0 s AND the sf0.1
# stream_upsert canary <= 2.0 s — the SOLO-TimeQuery clean reading
# is ~1.67 s per the scale-anchor table; BASELINE's <=1.2 s canary
# is the IN-SUITE hot-JVM number and only applies inside the bench
# artifact itself), runs in one contiguous window:
#   1. the full HEAD bench (sf0.1 suite + stream lane + x10 lane)
#   2. solo gauge-bracketed sim_topk_ivf(pq)_clustered (task 2)
#   3. the x100 triangles anchor at 32g (task 4)
#   4. a closing gauge so the whole campaign is bracketed
# Every step appends to $LOG; artifacts land in bench_last.json.
# usage: clean_window_campaign.sh [max_poll_attempts] [poll_sleep_sec]
set -u
cd /root/repo
# shuffle on tmpfs: isolates the campaign from neighbor-IO writeback
# storms on the shared vda disk (r12 precedent; verified in use —
# 4.9 GB of blockmgr files land in shm during a triangles gauge run)
export SPARK_LOCAL_DIRS=/dev/shm/sparktmp
mkdir -p "$SPARK_LOCAL_DIRS"
LOG=${CAMPAIGN_LOG:-/root/repo/.tmp/campaign_r14.log}
MAX=${1:-40}
SLEEP=${2:-240}
X10=/root/scratch/x10
X100=/root/scratch/x100
SF=/root/testdata/sf0.1

say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

gauge() { # prints "tri winnow upsert"
  local g u
  g=$(./tools_run.sh graft.tools.TimeQuery $X10 q_triangles text_winnow 2>/dev/null)
  u=$(./tools_run.sh graft.tools.TimeQuery $SF stream_upsert 2>/dev/null)
  local tri=$(echo "$g" | awk '/q_triangles/{print $2}')
  local win=$(echo "$g" | awk '/text_winnow/{print $2}')
  local ups=$(echo "$u" | awk '/stream_upsert/{print $2}')
  echo "$tri $win $ups"
}

attempt=0
while : ; do
  attempt=$((attempt+1))
  read -r TRI WIN UPS <<< "$(gauge)"
  say "poll $attempt: x10 q_triangles=${TRI}s (band 21.2-22.6) text_winnow=${WIN}s (band 1.4-2.0) stream_upsert=${UPS}s (canary <=1.3)"
  # Calm-stretch criterion (round 14): across 20+ solo best-of-2
  # polls after this round's testdata regeneration, q_triangles
  # never read below 22.90 (typical calm 23.0-23.5, storms 25-37)
  # while text_winnow (1.41) and stream_upsert (1.64) minima matched
  # their pre-regen anchors — today's triangles clean floor is
  # ~22.9-23.4, i.e. the regenerated corpus carries ~3-5% more wedge
  # mass. Accept <=23.5 with the CPU gauge tight (<=1.7) and the
  # stream canary near its floor (<=2.0); the bench artifact embeds
  # both gauges so it self-rates whatever window it actually got.
  ok=$(python3 -c "print(1 if float('$TRI')<=23.5 and float('$WIN')<=1.7 and float('$UPS')<=2.0 else 0)")
  [ "$ok" = "1" ] && break
  if [ "$attempt" -ge "$MAX" ]; then
    say "no clean window after $MAX polls — giving up"
    exit 2
  fi
  sleep "$SLEEP"
done

say "CLEAN WINDOW (tri=$TRI win=$WIN ups=$UPS) — starting campaign"

say "step 1: full HEAD bench (sf0.1 + streams + x10 lane)"
SPARK_GRAFT_SF_DIR=$SF ./tools_run.sh graft.Bench >> "$LOG" 2>/dev/null
say "bench rc=$? (artifact: bench_last.json)"

say "step 2: solo sim_topk_ivf(pq)_clustered, gauge-bracketed"
./tools_run.sh graft.tools.TimeQuery $SF sim_topk_ivf_clustered sim_topk_ivfpq_clustered 2>/dev/null | tee -a "$LOG"
./tools_run.sh graft.tools.TimeQuery $X10 q_triangles 2>/dev/null | tee -a "$LOG"

say "step 3: x100 triangles anchor (cold single-run, 32g)"
GRAFT_TIME_ONCE=1 ./tools_run.sh -m32g graft.tools.TimeQuery $X100 q_triangles 2>/dev/null | tee -a "$LOG"

say "step 4: closing gauge"
./tools_run.sh graft.tools.TimeQuery $X10 q_triangles text_winnow 2>/dev/null | tee -a "$LOG"
./tools_run.sh graft.tools.TimeQuery $SF stream_upsert 2>/dev/null | tee -a "$LOG"
say "campaign complete"

#!/bin/bash
GRAFT_BENCH_X10=0 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  /root/repo/tools_run.sh -m24g graft.Bench > /root/repo/.tmp/bench_diag.json 2>/root/repo/.tmp/bench_diag.err &
BPID=$!
sleep 5
JPID=$(pgrep -f "graft.Bench" | head -1)
echo "bench jvm pid $JPID"
i=0
while kill -0 $BPID 2>/dev/null; do
  jstack $JPID > /root/repo/.tmp/js_$i.txt 2>/dev/null
  i=$((i+1)); sleep 15
done
echo "done, $i samples"

#!/bin/bash
# Round-14 mover adjudication (verdict #1): the five unadjudicated
# shared arms from BENCH_r13, run isolated min-of-5 on the r13 tree and
# on an r12-code worktree control, back-to-back on the same box.
set -x
ARMS=dd_incr_neardup,dd_contamination,gr_linkpred,ir_chunk_rollup,gr_lpa
export SPARK_GRAFT_BENCH_ONLY=$ARMS
export SPARK_GRAFT_BENCH_REPS=5
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1

cd /root/repo/.worktrees/r13ctl || exit 1
SPARK_GRAFT_BENCH_OUT=/root/repo/adjud_r13.json \
  timeout 2400 sbt -batch "runMain graft.Bench" \
  > /root/repo/adjud_r13.log 2>&1

cd /root/repo/.worktrees/r12ctl || exit 1
SPARK_GRAFT_BENCH_OUT=/root/repo/adjud_r12.json \
  timeout 2400 sbt -batch "runMain graft.Bench" \
  > /root/repo/adjud_r12.log 2>&1

echo DONE

#!/usr/bin/env bash
# One-command sf1 sweep (round 13 verdict item #1): ScaleGen the driver's
# sf0.1 testdata 10x into a scratch dir, run the FULL oracle gate on it
# (Verify + DuckDB compare -> CORRECTNESS_SF1.json), then a min-of-2 bench
# (-> BENCH_SF1.json, full-precision RAW format). The sf1 gate caught the
# q111 tie-at-cutoff bug no smaller scale could exhibit; this script makes
# it a per-round artifact instead of a heroic manual run.
#
# Usage: tools/sf1_sweep.sh            (~25-35 min total on an idle host)
#   SF1_DIR=/tmp/elsewhere tools/sf1_sweep.sh   to override the corpus dir
#   SKIP_BENCH=1 tools/sf1_sweep.sh             gate only (~12 min)
#
# The Bench budget is DERIVED from the corpus size (Bench.scala round 14:
# 365 + 60*(bytes/sf0.1_bytes - 1) ≈ 905 s at sf1 — the measured min-of-2
# need); set SPARK_GRAFT_BUDGET_S to override. Never run this while
# another sbt process holds the project lock.
set -euo pipefail
cd "$(dirname "$0")/.."

SF1_DIR=${SF1_DIR:-/tmp/graft_sf1}
VERIFY_OUT=${VERIFY_OUT:-/tmp/graft_verify_sf1}
CPUS=${SPARK_GRAFT_CPUS:-32}

# reuse only a COMPLETE corpus: embeddings is the LAST table ScaleGen
# writes, so its presence (with documents) implies the run finished — a
# partial dir from an interrupted ScaleGen must regenerate, not half-gate
if [ ! -d "$SF1_DIR/documents.parquet" ] || [ ! -d "$SF1_DIR/embeddings.parquet" ]; then
  echo "== [1/3] ScaleGen sf0.1 x10 -> $SF1_DIR"
  rm -rf "$SF1_DIR"
  SPARK_GRAFT_CPUS=$CPUS sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 $SF1_DIR 10"
else
  echo "== [1/3] reusing existing $SF1_DIR"
fi

echo "== [2/3] oracle gate at sf1 (Verify + DuckDB) -> CORRECTNESS_SF1.json"
rm -rf "$VERIFY_OUT"
SPARK_GRAFT_CPUS=$CPUS sbt -batch "runMain graft.Verify $SF1_DIR $VERIFY_OUT"
python3 tools/local_check.py "$SF1_DIR" "$VERIFY_OUT" --json CORRECTNESS_SF1.json

if [ "${SKIP_BENCH:-0}" = "1" ]; then
  echo "== [3/3] bench skipped (SKIP_BENCH=1)"
  exit 0
fi

echo "== [3/3] min-of-2 bench at sf1 -> BENCH_SF1.json"
BENCH_LOG=$(mktemp /tmp/sf1_bench.XXXXXX.log)
SPARK_GRAFT_SF_DIR=$SF1_DIR SPARK_GRAFT_CPUS=$CPUS \
  SPARK_GRAFT_RAW_OUT=$PWD/BENCH_SF1.json \
  sbt -batch "runMain graft.Bench" > "$BENCH_LOG" 2>&1 || {
    echo "== BENCH FAILED — see $BENCH_LOG (BENCH_SF1.json may be stale)"; exit 1; }
grep '{"metric' "$BENCH_LOG" || {
  echo "== BENCH emitted no metric line — see $BENCH_LOG"; exit 1; }
echo "== done: CORRECTNESS_SF1.json + BENCH_SF1.json (record totals in PLANS.md)"

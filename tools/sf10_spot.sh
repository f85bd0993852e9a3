#!/usr/bin/env bash
# sf10 exponent spot (round 16; r15 verdict stretch item 8): ScaleGen the
# driver's sf0.1 testdata 100x into a scratch dir, then bench ONLY the
# exponent-suspect set — the quadratic-regime dedup/similarity faces, the
# lake/state chains, and the ANN twins (q94 full ADC scan vs q144 IVF-PQ)
# — extending the measured sf1->sf3 exponent table a further half-decade.
#
# No DuckDB gate at sf10: the suspect queries' oracles are themselves
# quadratic SQL (exact pair joins) and would dominate the run by an order
# of magnitude; sf10 correctness rides on the sf1 + sf3 full gates.
#
# Usage: tools/sf10_spot.sh          (~60-90 min; ~2 GB in /tmp)
#   SF10_DIR=/tmp/elsewhere tools/sf10_spot.sh    to override the corpus dir
# Never run while another sbt process holds the project lock.
set -euo pipefail
cd "$(dirname "$0")/.."

SF10_DIR=${SF10_DIR:-/tmp/graft_sf10}
CPUS=${SPARK_GRAFT_CPUS:-32}
SPOT=q15_embedding_near_dup,q16_jaccard_pairs,q18_simhash,q27_simhash_pairs,q34_ivf_topk,q53_session_overlap,q55_lake_roundtrip,q76_repair_day,q87_prefix_jaccard,q94_pq_topk,q97_fuzzy_match,q121_lambda_read,q124_incremental_agg,q133_simhash_wide_pairs,q134_fuzzy_join_exact,q138_incremental_clusters,q139_incremental_capstone,q144_ivfpq_topk

# reuse only a COMPLETE corpus (embeddings is the last table ScaleGen writes)
if [ ! -d "$SF10_DIR/documents.parquet" ] || [ ! -d "$SF10_DIR/embeddings.parquet" ]; then
  echo "== [1/2] ScaleGen sf0.1 x100 -> $SF10_DIR"
  rm -rf "$SF10_DIR"
  SPARK_GRAFT_CPUS=$CPUS sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 $SF10_DIR 100"
else
  echo "== [1/2] reusing existing $SF10_DIR"
fi

# budget 4500 s: one full coverage pass (~2700 s estimated from the sf3
# numbers x (10/3)^exp) plus expensive-first re-sampling of the mid-tier;
# q15's ~27 min single pass is deliberately NOT re-sampled (its cost
# estimate +30% will not fit the remainder).
echo "== [2/2] spot bench at sf10 -> BENCH_SF10.json"
BENCH_LOG=$(mktemp /tmp/sf10_bench.XXXXXX.log)
SPARK_GRAFT_SF_DIR=$SF10_DIR SPARK_GRAFT_CPUS=$CPUS \
  SPARK_GRAFT_ONLY=$SPOT \
  SPARK_GRAFT_BUDGET_S=${SPARK_GRAFT_BUDGET_S:-4500} \
  SPARK_GRAFT_RAW_OUT=$PWD/BENCH_SF10.json \
  sbt -batch "runMain graft.Bench" > "$BENCH_LOG" 2>&1 || {
    echo "== BENCH FAILED — see $BENCH_LOG (BENCH_SF10.json may be stale)"; exit 1; }
grep '{"metric' "$BENCH_LOG" || {
  echo "== BENCH emitted no metric line — see $BENCH_LOG"; exit 1; }
echo "== done: BENCH_SF10.json (record the exponent table in PLANS.md)"

#!/usr/bin/env bash
# Drift-normalized benching (round-11 verdict item 2): run a FIXED
# 10-query subset from the PINNED round-10 canary jar
# (tools/canary/graft-canary-r10.jar, built once from commit 34682e1)
# in a fresh JVM, same machine, back-to-back with the round's sweep.
#
# The canary's code never changes, so sweep-total ÷ canary-total is the
# environment-corrected headline: day-to-day machine drift (which reads
# 1.2-1.4x on identical code here) moves both numbers together and
# cancels, while a real engine regression moves only the sweep.
#
#   tools/canary_bench.sh [OUT.json]          # default BENCH_CANARY.json
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1   # same dir as the sweep
#
# Canonical artifact pair (round-11 verdict item 8 — the only canary
# names in use from round 12 on): BENCH_CANARY.json (result line) +
# BENCH_CANARY_DETAIL.json (per-sweep detail). graft.Bench runs this
# script automatically after every full sweep and embeds the result
# under the sweep artifact's "canary" key; round artifacts are the
# committed copies of this pair alongside BENCH_rNN.json.
#
# Normalize with: tools/bench_compare.py SWEEP_OLD SWEEP_NEW --normalize
#   CANARY_OLD CANARY_NEW
#
# If the jar is missing (fresh clone without the binary), rebuild it:
#   git worktree add /tmp/canary-r10-src 34682e1
#   (cd /tmp/canary-r10-src && sbt -batch package)
#   mkdir -p tools/canary && cp /tmp/canary-r10-src/target/scala-2.13/*.jar \
#     tools/canary/graft-canary-r10.jar
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
JAR="$REPO/tools/canary/graft-canary-r10.jar"
[ -f "$JAR" ] || { echo "canary jar missing: $JAR (see header)" >&2; exit 2; }
OUT="${1:-$REPO/BENCH_CANARY.json}"
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
# Fixed forever (the normalization breaks if this set moves): one agg,
# one 5-way join, one percentile, the scd2 protocol replay, z-order
# pruning, CoW delete, file-skip scan, SQL update, MoR update, an
# expression-heavy text scorer.
export SPARK_GRAFT_BENCH_ONLY="${CANARY_QUERIES:-q01_agg_grain_min,q05_join5_revenue,q23_percentile,q49_pipeline_scd2,q56_zorder_prune,q61_row_delete,q70_dsv2_file_skip,q74_sql_update,q90_mor_update,t18_bigram_lm_score}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
WORK="$(mktemp -d /tmp/canary-bench.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT
( cd "$WORK" && \
  java $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    "-Xmx${SPARK_DRIVER_MEM:-8g}" \
    -cp "$JAR:/opt/spark/jars/*" graft.Bench )
# a BENCH_ONLY subset writes *_CANARY-suffixed artifacts inside $WORK
# (the pinned jar's Bench.scala naming) — copied out to the canonical
# pair names
cp "$WORK/BENCH_RESULT_CANARY.json" "$OUT"
[ -f "$WORK/BENCH_DETAIL_CANARY.json" ] && \
  cp "$WORK/BENCH_DETAIL_CANARY.json" "${OUT%.json}_DETAIL.json" || true
echo "canary result -> $OUT"

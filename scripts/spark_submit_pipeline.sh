#!/usr/bin/env bash
# Production submission of the KG materialization pipeline.
# On a real cluster, drop the local bits and size executors for the data:
#   ~1 core-second per 400 conversations (40-turn) measured; shuffle is one
#   conv_id exchange, so shuffle partitions ≈ total cores × 4.
set -euo pipefail
JAR=${JAR:-target/scala-2.13/legalknowledgegraphsspark_2.13-0.1.0.jar}
INPUT=${1:?usage: $0 <transcripts path> <output root> [buckets]}
OUTPUT=${2:?}
BUCKETS=${3:-512}

exec spark-submit \
  --class graft.Main \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions=$(( ${TOTAL_CORES:-128} * 4 )) \
  --conf spark.sql.files.maxPartitionBytes=268435456 \
  "$JAR" materialize --input "$INPUT" --output "$OUTPUT" --buckets "$BUCKETS"

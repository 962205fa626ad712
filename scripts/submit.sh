#!/usr/bin/env bash
# Package the engine and run a job via spark-submit --py-files (north_rule
# deployment path). Everything before `--` goes to spark-submit; everything
# after goes to the job.
#
#   scripts/submit.sh --master local[32] -- --pages-n 100000 --iters 10
#   scripts/submit.sh --master spark://head:7077 --num-executors 64 -- ...
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/ugfraud_spark.zip"
(cd "$REPO" && find ugfraud_spark -name '*.py' | zip -q "$ZIP" -@)

SUBMIT_ARGS=()
JOB_ARGS=()
seen_sep=0
for a in "$@"; do
  if [[ "$a" == "--" && $seen_sep -eq 0 ]]; then seen_sep=1; continue; fi
  if [[ $seen_sep -eq 0 ]]; then SUBMIT_ARGS+=("$a"); else JOB_ARGS+=("$a"); fi
done

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "${SUBMIT_ARGS[@]}" \
  "$REPO/scripts/pagerank_job.py" "${JOB_ARGS[@]}"

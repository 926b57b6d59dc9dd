#!/usr/bin/env bash
# Package the engine and spark-submit a job with --py-files (north-rule run mode).
#   ./jobs/submit.sh jobs/run_pipeline.py [job args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
JOB="$1"; shift
ZIP="$(mktemp -d)/erased_cells_spark.zip"
(cd "$REPO" && python -c "
import zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('erased_cells_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
")
MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.driver.memory="${SPARK_GRAFT_DRIVER_MEM:-16g}" \
  "$REPO/$JOB" "$@"

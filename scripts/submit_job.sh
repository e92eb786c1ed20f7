#!/usr/bin/env bash
# Package the library and run one job via spark-submit --py-files —
# the production invocation (BASELINE north rule). Usage:
#
#   scripts/submit_job.sh job.json [--master local[16]]
#
# On a real cluster, replace --master with your cluster master /
# --deploy-mode and the same zip + config travel to the executors.
#
# NOTE: pass --driver-memory/--executor-memory HERE (spark-submit
# flags), not in the job config: once spark-submit has started the
# driver JVM, spark.driver.memory from the in-process session builder
# is silently ignored.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CONFIG="${1:?usage: submit_job.sh job.json [--master ...]}"
shift || true

ZIP="$(mktemp -d)/otel2pv_spark.zip"
(cd "$REPO" && python -c "
import zipfile, pathlib
zf = zipfile.ZipFile('$ZIP', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('otel2pv_spark').rglob('*.py')):
    zf.write(p, str(p))
zf.close()
print('packaged', '$ZIP')
")

exec spark-submit \
  --py-files "$ZIP" \
  "$@" \
  "$REPO/scripts/run_job.py" --config "$CONFIG"

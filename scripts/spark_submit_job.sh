#!/usr/bin/env bash
# Run the pipeline the way a cluster deployment does: spark-submit with
# the engine shipped as --py-files (BASELINE north rule). On a real
# cluster, swap --master for yarn/k8s and size executors; the job code
# is identical.
#
# Usage: scripts/spark_submit_job.sh CONFIG INPUT OUT [MASTER]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CONFIG="${1:?config json}"; INPUT="${2:?input pages dir}"; OUT="${3:?output dir}"
MASTER="${4:-local[32]}"

PKG_ZIP="$(mktemp -d)/logagent_spark.zip"
(cd "$REPO" && python -c "
import zipfile, pathlib
zf = zipfile.ZipFile('$PKG_ZIP', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('logagent_spark').rglob('*.py')):
    zf.write(p, str(p))
zf.close()
")

exec spark-submit \
  --master "$MASTER" \
  --py-files "$PKG_ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions=64 \
  --conf spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=2 \
  "$REPO/scripts/run_job.py" \
  -f "$CONFIG" --input "$INPUT" --out "$OUT" --chunks 8 --keep url,lang,warc_ts

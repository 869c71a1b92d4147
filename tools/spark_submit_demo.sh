#!/bin/bash
# End-to-end demo of the north-rule deployment model: package the engine as a
# --py-files zip and spark-submit the flagship streaming job to the local
# standalone cluster (separate master/worker/executor JVMs).
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
export REPO
SPARK_PKG=$(python -c "import pyspark, os; print(os.path.dirname(pyspark.__file__))")

bash "$REPO/tools/standalone_cluster.sh" start 8

ZIP=/tmp/pipeflow_spark_pyfiles.zip
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" pipeflow_spark -i '*.py')

WORK=$(mktemp -d /tmp/pipeflow_submit_XXXX)
python - "$WORK" <<'EOF'
import sys, os, datetime as dt
sys.path.insert(0, os.environ.get("REPO", "/root/repo"))
from pipeflow_spark.streaming.transcripts import synthesize_transcripts, write_arrival_files, write_sentinel_file
work = sys.argv[1]
pdf = synthesize_transcripts(n_convs=2000, n_files=4, seed=42)
write_arrival_files(pdf, os.path.join(work, "src"))
write_sentinel_file(os.path.join(work, "src"), dt.datetime(2026, 1, 1))
print("input turns:", len(pdf))
EOF

"$SPARK_PKG/bin/spark-submit" \
  --master spark://127.0.0.1:7077 \
  --conf spark.cores.max=8 --conf spark.executor.cores=2 --conf spark.executor.memory=4g \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  "$REPO/tools/submit_job.py" "$WORK/src" "$WORK/out" "$WORK/ckpt" 2>&1 | grep -E "SUBMIT_OK|Error" || true
rm -rf "$WORK"

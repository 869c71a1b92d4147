#!/bin/bash
# Local Spark standalone cluster: 1 master + N workers (2 cores, 8g each) —
# real executor JVMs on one machine, the sandbox stand-in for a multi-executor
# cluster (the north rule's spark-submit deployment model).  Single-JVM
# local[N] is a poor scaling proxy: task threads share one heap/GC/JIT, which
# measurably anti-scales on this box, while separate executor JVMs scale like
# independent processes do.
#
# Usage: standalone_cluster.sh start [n_workers] | stop | status
set -e
SPARK_PKG=$(python -c "import pyspark, os; print(os.path.dirname(pyspark.__file__))")
LOGS=/tmp/spark-standalone/logs
MASTER_URL=spark://127.0.0.1:7077

case "${1:-status}" in
  start)
    N=${2:-8}
    mkdir -p "$LOGS"
    if ! pgrep -f "deploy.master.Master" >/dev/null; then
      nohup "$SPARK_PKG/bin/spark-class" org.apache.spark.deploy.master.Master \
        -h 127.0.0.1 -p 7077 --webui-port 8090 >"$LOGS/master.log" 2>&1 &
      sleep 6
    fi
    RUNNING=$(pgrep -cf "deploy.worker.Worker" || true)
    for i in $(seq $((RUNNING + 1)) "$N"); do
      SPARK_WORKER_DIR=/tmp/spark-standalone/worker$i nohup "$SPARK_PKG/bin/spark-class" \
        org.apache.spark.deploy.worker.Worker "$MASTER_URL" -c 2 -m 8g -h 127.0.0.1 \
        --webui-port $((8100 + i)) >"$LOGS/worker$i.log" 2>&1 &
    done
    sleep 8
    echo "master=$MASTER_URL workers=$(pgrep -cf 'deploy.worker.Worker')"
    ;;
  stop)
    pkill -f "deploy.worker.Worker" || true
    pkill -f "deploy.master.Master" || true
    echo stopped
    ;;
  status)
    echo "master: $(pgrep -cf 'deploy.master.Master') workers: $(pgrep -cf 'deploy.worker.Worker')"
    ;;
esac

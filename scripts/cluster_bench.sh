#!/bin/bash
# Real multi-executor scaling evidence (north_rule: N vs 4N executors,
# spark-submit --py-files). Starts a Spark standalone master + one
# 32-core worker, then runs scripts/submit_job.py at 1 and 4
# single-core executors on the same deterministic 1 GB transcript
# input. Results recorded in BENCH/BASELINE.md.
set -euo pipefail
cd "$(dirname "$0")/.."

export SPARK_LOG_DIR=/tmp/spark-logs SPARK_PID_DIR=/tmp/spark-pids \
       SPARK_WORKER_DIR=/tmp/spark-work
mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR" "$SPARK_WORKER_DIR"
/opt/spark/sbin/start-master.sh -h 127.0.0.1 -p 7077 --webui-port 8090
sleep 4
SPARK_WORKER_CORES=32 SPARK_WORKER_MEMORY=64g \
  /opt/spark/sbin/start-worker.sh spark://127.0.0.1:7077 --webui-port 8091
sleep 4

rm -f /tmp/pgs.zip
zip -qr /tmp/pgs.zip parquet_go_spark -x "*__pycache__*"

python - <<'EOF'
import pyarrow.parquet as pq, os
from parquet_go_spark.fixtures import make_transcripts
os.makedirs("/tmp/pgs_in_1g", exist_ok=True)
t = make_transcripts(200_000, seed=42)
step = (t.num_rows+63)//64
for i in range(0, t.num_rows, step):
    pq.write_table(t.slice(i, step),
                   f"/tmp/pgs_in_1g/p{i//step:04d}.parquet",
                   row_group_size=1<<15)
print("input rows:", t.num_rows)
EOF

TUNE="--conf spark.shuffle.compress=false \
      --conf spark.shuffle.spill.compress=false \
      --conf spark.local.dir=/dev/shm/spark-tmp \
      --conf spark.sql.execution.arrow.maxRecordsPerBatch=65536 \
      --conf spark.sql.shuffle.partitions=128"
for MODE in shuffle direct; do
  for N in 1 4; do
    rm -rf "/tmp/pgs_out_cluster_${MODE}_$N"
    echo "mode=$MODE cores=$N"
    /opt/spark/bin/spark-submit --master spark://127.0.0.1:7077 \
      --executor-cores 1 --executor-memory 4g --total-executor-cores "$N" \
      $TUNE --py-files /tmp/pgs.zip scripts/submit_job.py \
      /tmp/pgs_in_1g "/tmp/pgs_out_cluster_${MODE}_$N" 128 "$MODE" \
      2>/dev/null | tail -1
  done
done

/opt/spark/sbin/stop-worker.sh
/opt/spark/sbin/stop-master.sh

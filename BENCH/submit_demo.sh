#!/usr/bin/env bash
# Package the engine and run the flagship job through spark-submit
# --py-files, exactly as it would ship to a multi-executor cluster
# (swap --master local[N] for yarn/k8s + executor confs there).
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/housenumbercore_spark.zip
rm -f "$ZIP"
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("/tmp/housenumbercore_spark.zip", "w") as z:
    for root, _, files in os.walk("housenumbercore_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
EOF

MASTER="${SPARK_MASTER:-local[8]}"
# On a real multi-executor master, prefer the lineage-retaining pin
# strategy so a lost executor recomputes instead of failing the job
# (housenumbercore_spark/pinning.py; local[...] keeps the faster
# localCheckpoint default):
# single-JVM masters only: "local" / "local[N]" / "local[*]" —
# local-cluster[...] spawns real executor JVMs and takes the cluster path
PIN_STRATEGY="${HNC_PIN_STRATEGY:-local}"
case "$MASTER" in
  local|local\[*) ;;
  *) PIN_STRATEGY="${HNC_PIN_STRATEGY:-persist}" ;;
esac
exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.housenumbercore.pin.strategy="$PIN_STRATEGY" \
  --py-files "$ZIP" \
  BENCH/submit_job.py "${1:-/root/testdata/sf0.001}"

#!/usr/bin/env bash
# sf1-scale spark-submit proof (north rule: spark-submit --py-files on a
# multi-executor cluster): submit the FULL linkage job against the cached
# sf1 corpus (~180k entities / 810k turns, scripts/bench_sf1.py builds it)
# on a true multi-JVM local-cluster of 4 worker processes x 8 cores each.
# Swap --master for a real cluster URL in production.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORPUS="${1:-/tmp/lev_sf1_corpus_72000}"
OUT="${2:-/tmp/levsubmit_sf1}"
MASTER="${SPARK_SUBMIT_MASTER:-local-cluster[4,8,4096]}"

if [ ! -e "$CORPUS/_SUCCESS" ]; then
    echo "corpus missing — run: python scripts/bench_sf1.py" >&2
    exit 1
fi
rm -rf "$OUT"

SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
ZIP="$(PYTHONPATH="$REPO" python -c 'from liblevenshtein_spark.session import build_pyfiles_zip; print(build_pyfiles_zip())')"

T0=$(date +%s)
"$SPARK_SUBMIT" \
    --master "$MASTER" \
    --conf spark.executor.memory=3500m \
    --conf spark.sql.shuffle.partitions=64 \
    --conf spark.ui.enabled=false \
    --py-files "$ZIP" \
    "$REPO/scripts/linkage_job.py" \
    --input "$CORPUS" \
    --output "$OUT"
T1=$(date +%s)

python - <<PY
import json, sys, time
sys.path.insert(0, "$REPO")
from liblevenshtein_spark.session import build_session
spark = build_session(master="local[8]", shuffle_partitions=16,
                      extra_conf={"spark.ui.enabled": "false"})
m = spark.read.parquet("$OUT/matches")
c = spark.read.parquet("$OUT/clusters")
res = {"metric": "sf1_submit_wall_sec", "value": $T1 - $T0, "unit": "sec",
       "master": "$MASTER",
       "rows": {"matches": m.count(),
                "clusters": c.select("cluster_id").distinct().count(),
                "entities": c.count()}}
print(json.dumps(res))
with open("$REPO/BENCH_SF1_SUBMIT.json", "w") as fh:
    json.dump(res, fh, indent=1)
spark.stop()
PY

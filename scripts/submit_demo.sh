#!/usr/bin/env bash
# End-to-end spark-submit demo (north rule: spark-submit --py-files on a
# multi-executor cluster). Builds the py-files zip, generates a synthetic
# transcripts table, and submits the linkage job to a local-cluster master
# (2 worker JVMs x 2 cores — swap --master for a real cluster URL).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/levsubmit}"
MASTER="${SPARK_SUBMIT_MASTER:-local-cluster[2,2,2048]}"

mkdir -p "$WORK"
python - <<PY
import sys
sys.path.insert(0, "$REPO")
from liblevenshtein_spark.session import build_session
from liblevenshtein_spark.sources.tables import TRANSCRIPTS_SCHEMA
from liblevenshtein_spark.testdata_gen import gen_transcript_rows
spark = build_session(master="local[2]", shuffle_partitions=4,
                      extra_conf={"spark.ui.enabled": "false"})
rows, _ = gen_transcript_rows(n_base=40, dup_fraction=0.6, max_edits=2)
spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA) \
    .write.mode("overwrite").parquet("$WORK/transcripts")
spark.stop()
PY

SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
ZIP="$(PYTHONPATH="$REPO" python -c 'from liblevenshtein_spark.session import build_pyfiles_zip; print(build_pyfiles_zip())')"

"$SPARK_SUBMIT" \
    --master "$MASTER" \
    --conf spark.executor.memory=1500m \
    --conf spark.ui.enabled=false \
    --py-files "$ZIP" \
    "$REPO/scripts/linkage_job.py" \
    --input "$WORK/transcripts" \
    --output "$WORK/out"

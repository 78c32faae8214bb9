#!/usr/bin/env bash
# Package recordlinkage_spark and run the dedup pipeline via spark-submit
# --py-files (the north_rule's deployment shape). On a real cluster swap
# --master local[*] for the cluster master / YARN / k8s.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="${1:?usage: run_spark_submit.sh <input_parquet> <out_dir> [extra args...]}"
OUT="${2:?usage: run_spark_submit.sh <input_parquet> <out_dir> [extra args...]}"
shift 2

ZIP="$(mktemp -d)/recordlinkage_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" recordlinkage_spark -x '*__pycache__*')

SPARK_SUBMIT="$(python -c 'import pyspark, pathlib; print(pathlib.Path(pyspark.__file__).parent / "bin" / "spark-submit")')"

"$SPARK_SUBMIT" \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE:-64}" \
  --conf spark.driver.memory="${SPARK_DRIVER_MEM:-48g}" \
  --py-files "$ZIP" \
  "$REPO/scripts/submit_pipeline.py" "$INPUT" "$OUT" "$@"

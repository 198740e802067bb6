#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit (north_rule packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/teleharvest_spark.zip
zip -qr dist/teleharvest_spark.zip teleharvest_spark -x '*__pycache__*'
echo "built dist/teleharvest_spark.zip"
echo "example:"
echo "  spark-submit --master 'local[8]' --py-files dist/teleharvest_spark.zip \\"
echo "      scripts/run_validation.py --input /tmp/sequences.parquet \\"
echo "      --output /tmp/validation_out --run-id r1"

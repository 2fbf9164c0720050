#!/bin/bash
# Package the engine for spark-submit --py-files (north-rule shipping path).
# Produces dist/gds_spark.zip containing the graph_data_science_spark package.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/gds_spark.zip
# -x: no caches; the package is pure Python, nothing to build
zip -qr dist/gds_spark.zip graph_data_science_spark -x '*__pycache__*' -x '*.pyc'
echo "dist/gds_spark.zip ($(du -h dist/gds_spark.zip | cut -f1))"
echo "ship with: spark-submit --master <cluster> --py-files dist/gds_spark.zip tools/submit_job.py --help"

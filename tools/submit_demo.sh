#!/bin/sh
# Demo: launch the crawl via spark-submit --py-files (north_rule launch shape).
# Re-running with the same WORKDIR resumes from the last committed snapshots.
set -e
cd "$(dirname "$0")/.."
WORKDIR="${1:-/tmp/aql_crawl_demo}"
TMP=$(mktemp -d)
zip -rq "$TMP/aql_spark.zip" archive_query_log_spark
spark-submit --master "${SPARK_MASTER:-local[8]}" --py-files "$TMP/aql_spark.zip" \
  tools/submit_crawl.py --workdir "$WORKDIR" \
  --frontier-size "${FRONTIER:-100000}" --images "${IMAGES:-10000}" \
  --rounds "${ROUNDS:-3}" --budget-waves "${BUDGET:-16}"

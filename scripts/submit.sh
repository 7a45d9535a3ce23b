#!/usr/bin/env bash
# Package the engine and submit the crawl to a cluster (north-rule
# deployment path: spark-submit --py-files at N / 4N executors).
#
#   ./scripts/submit.sh --master yarn --num-executors 250 ... -- \
#       --state-dir hdfs:///crawl/state --pages hdfs:///cc/pages ...
#
# Everything before `--` goes to spark-submit, everything after to
# scripts/run_crawl.py.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/web_scraper_spark.zip
rm -f "$ZIP"
python -c "
import zipfile, pathlib
z = zipfile.ZipFile('$ZIP', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('web_scraper_spark').rglob('*.py')):
    z.write(p, p.as_posix())
z.close()
print('packaged', '$ZIP')
"

SUBMIT_ARGS=()
APP_ARGS=()
seen_sep=0
for a in "$@"; do
  if [[ "$a" == "--" ]]; then seen_sep=1; continue; fi
  if [[ $seen_sep == 0 ]]; then SUBMIT_ARGS+=("$a"); else APP_ARGS+=("$a"); fi
done

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "${SUBMIT_ARGS[@]}" \
  scripts/run_crawl.py "${APP_ARGS[@]}"

#!/bin/bash
# Dev helper: run the stateless sweep on a named subset of corpus files.
# Usage: tools/sweep_files.sh 01698_map_subtract 00745_compile ...
# (names with or without .sql)
CORPUS=/root/reference/tests/queries/4_cnch_stateless
TMP=$(mktemp -d /tmp/sweep_subset.XXXX)
for f in "$@"; do
  base="${f%.sql}"
  cp "$CORPUS/$base.sql" "$TMP/" 2>/dev/null || { echo "missing $base.sql"; }
  cp "$CORPUS/$base.reference" "$TMP/" 2>/dev/null
done
bash /root/repo/tools/run_sweep.sh "$TMP" /tmp/subset_pass.txt 10000
rc=$?
rm -rf "$TMP"
exit $rc

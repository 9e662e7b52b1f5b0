#!/bin/sh
# Idle re-measure protocol for the replica suite (VERDICT r9 #1):
# after the full suite record lands, re-run each >10s row ALONE in a
# fresh JVM on the (now idle) box, then fold the partial records back
# into the suite artifact with tools/bench_merge.py — the merged
# record carries both observations per row, adjudicating itself.
#
# Usage: tools/remeasure_heavy.sh SUITE.json SF_DIR
# Prints the merge command to run once all partials exist.
set -eu
SUITE="$1"
SF_DIR="$2"
HERE="$(cd "$(dirname "$0")/.." && pwd)"
NAMES=$(python3 - "$SUITE" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print("\n".join(k for k, v in d["queries"].items() if v > 10))
EOF
)
for n in $NAMES; do
  echo "== idle re-measure: $n"
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_DRIVER_MEM=48g \
    SPARK_GRAFT_BENCH_ONLY="$n" python3 "$HERE/bench.py"
done
echo "== partials written; merge with:"
echo "python tools/bench_merge.py $SUITE <partials...> -o ${SUITE%.json}_merged.json"

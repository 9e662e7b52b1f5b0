#!/bin/sh
# Full per-round bench protocol (VERDICT r9 #1, sf0.1 leg added per
# VERDICT r10 #1), run on an OTHERWISE IDLE box, strictly sequential
# so no stage contaminates another:
#
#   1. sf0.1 full suite          -> BENCH_LOCAL_r{N}[-x].json
#   2. 10x replica full suite    -> BENCH_LOCAL_r{N}_sf1[-x].json
#   3. 100x replica full suite   -> BENCH_LOCAL_r{N}_sf10[-x].json
#   4. idle re-measure of every >10s row of (3), one fresh JVM each
#   5. bench_merge of (3)+(4)    -> *_merged.json (both observations kept)
#
# Each suite's artifact filename is captured from bench.py's own
# stdout (the compact line's "full_record" field) rather than
# inferred by mtime — a stale prior-round file that was touched can
# no longer be silently re-measured and merged (ADVICE r10).
#
# Usage: tools/bench_round.sh [SF1_DIR] [SF10_DIR]
set -eu
HERE="$(cd "$(dirname "$0")/.." && pwd)"
SF1="${1:-/tmp/sparkgraft_sf1}"
SF10="${2:-/tmp/sparkgraft_sf10}"

# bench.py prints the compact JSON line LAST; pull full_record from it
record_of() {
  printf '%s\n' "$1" | tail -1 | python3 -c \
    'import json, sys; print(json.load(sys.stdin)["full_record"])'
}

echo "== stage 1: sf0.1 suite"
OUT1=$(python3 "$HERE/bench.py")
printf '%s\n' "$OUT1"
echo "sf0.1 record: $(record_of "$OUT1")"

echo "== stage 2: 10x suite"
OUT2=$(SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_DRIVER_MEM=16g python3 "$HERE/bench.py")
printf '%s\n' "$OUT2"
echo "10x record: $(record_of "$OUT2")"

echo "== stage 3: 100x suite"
OUT3=$(SPARK_GRAFT_SF_DIR="$SF10" SPARK_GRAFT_DRIVER_MEM=48g python3 "$HERE/bench.py")
printf '%s\n' "$OUT3"
SUITE="$HERE/$(record_of "$OUT3")"

echo "== stage 4: idle re-measure of >10s rows in $SUITE"
before=$(ls "$HERE"/BENCH_LOCAL_r*_sf10_partial*.json 2>/dev/null || true)
"$HERE/tools/remeasure_heavy.sh" "$SUITE" "$SF10"
after=$(ls "$HERE"/BENCH_LOCAL_r*_sf10_partial*.json 2>/dev/null || true)
PARTIALS=""
for f in $after; do
  case " $before " in *" $f "*) ;; *) PARTIALS="$PARTIALS $f" ;; esac
done

echo "== stage 5: merge"
if [ -n "$PARTIALS" ]; then
  # shellcheck disable=SC2086
  python3 "$HERE/tools/bench_merge.py" "$SUITE" $PARTIALS \
    -o "${SUITE%.json}_merged.json"
  echo "merged -> ${SUITE%.json}_merged.json"
else
  echo "no rows over 10s; suite record stands alone"
fi

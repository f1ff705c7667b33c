#!/usr/bin/env bash
# Host-drift A/B protocol (the round-12 verdict's task 2, now a script
# instead of narrative): bench one query at an OLD revision and at the
# working tree under the SAME host conditions, interleaved A B A B so
# one-sided host stalls hit both arms equally. This is the only valid
# way to conclude a regression/improvement on this shared VM — totals
# across sessions drift ±10-15%.
#
# usage: scripts/ab_bench.sh <query> <old-rev> [sf_dir] [rounds]
# output: one line per run (arm, round, per-query seconds = min of the
# bench unit's two samples), then a min-per-arm summary. Paste the
# table into the round notes / an AB_*.md artifact.
set -euo pipefail
QUERY=$1
REV=$2
SFDIR=$(cd "${3:-tmp_sf1_organic}" && pwd)
ROUNDS=${4:-2}
REPO=$(git rev-parse --show-toplevel)
WT=$(mktemp -d /tmp/ab_wt.XXXXXX)
git worktree add -f "$WT" "$REV" >/dev/null 2>&1
trap 'git worktree remove -f "$WT" >/dev/null 2>&1 || true' EXIT

echo "ab_bench: building old jar at $REV ..." >&2
(cd "$WT" && sbt -batch package >/dev/null 2>&1)
echo "ab_bench: building working-tree jar ..." >&2
(cd "$REPO" && sbt -batch package >/dev/null 2>&1)

run_arm() { # $1 = dir, $2 = label, $3 = round
  local out
  out=$(cd "$1" && SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_ONLY="$QUERY" \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep -m1 '"metric"')
  AB_OUT="$out" python3 - "$2" "$3" "$QUERY" <<'PY'
import json, os, sys
label, rnd, q = sys.argv[1], sys.argv[2], sys.argv[3]
d = json.loads(os.environ["AB_OUT"])
samples = d.get("samples", {}).get(q) or [d["queries"][q]]
print(f"{label} round {rnd}: {q} = {min(samples):.2f} s  (samples {samples})")
PY
}

echo "query=$QUERY old=$REV sf_dir=$SFDIR rounds=$ROUNDS"
for r in $(seq 1 "$ROUNDS"); do
  run_arm "$WT" "OLD" "$r"
  run_arm "$REPO" "NEW" "$r"
done

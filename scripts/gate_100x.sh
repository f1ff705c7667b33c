#!/usr/bin/env bash
# 100x ORGANIC correctness gate (round-15 continuation): the same
# hash-verification gate_30x.sh runs, pointed at the 100x organic corpus
# (GenOrganic arg 100, tmp_sf10_organic) — the scale where the adaptive
# regimes move past everything the 30x gate checked (embed bits=14,
# semdedup k=512, containment nRep≈470k). One decade of organic growth
# over the 10x gates, hash-verified, with the Guard regimes committed in
# the artifact.
#
# usage: scripts/gate_100x.sh [verify_out_dir]  (default /tmp/verify_sf10)
set -euo pipefail
cd "$(dirname "$0")/.."
GATE30_SF_DIR=${GATE100_SF_DIR:-tmp_sf10_organic} \
GATE30_OUT_JSON=${GATE100_OUT_JSON:-CORRECTNESS_100x.json} \
GATE30_QUERIES=${GATE100_QUERIES:-embed_near_dup,semdedup_prune,dedup_containment,communities_lpa,er_clusters,golden_record_merge} \
  exec scripts/gate_30x.sh "${1:-/tmp/verify_sf10}"

#!/bin/bash
# Per-round conformance artifact, one command: dump all 52 reference-job
# twins at the given SF and value-compare each against its rendered DuckDB
# oracle (multiset fingerprints), writing CONFORMANCE_r<round>.json at the
# repo root. Run from /root/repo at the end of every round:
#
#   scripts/make_conformance_artifact.sh <round> [sfDir] [dumpDir]
#
# Exits non-zero if any job fails the compare, so a round-end invocation
# cannot silently ship a red artifact.
set -euo pipefail
ROUND=${1:?usage: make_conformance_artifact.sh <round> [sfDir] [dumpDir]}
SF=${2:-/root/testdata/sf0.1}
DUMP=${3:-/tmp/graft_conf_dump}
cd "$(dirname "$0")/.."

sbt -batch "Test/runMain graft.ConformanceDump $SF $DUMP"
python3 scripts/conformance_check.py "$DUMP" "$SF" "CONFORMANCE_r${ROUND}.json"
python3 - "CONFORMANCE_r${ROUND}.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"{d['jobs_pass']}/{d['jobs_total']} pass, {d['jobs_fail']} fail -> {sys.argv[1]}")
sys.exit(0 if d["jobs_fail"] == 0 else 1)
EOF

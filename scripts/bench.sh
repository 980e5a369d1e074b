#!/bin/bash
# Launch graft.Bench via java -cp directly (no sbt prefix/suffix lines):
# stdout carries ONLY the bench's own output, ending in the bare
# headline JSON line. The sbt path also emits a bare last line now
# (build.sbt: StdoutOutput + showSuccess/showTiming=false), but this
# script is the zero-wrapper fallback; it also leaves
# BENCH_HEADLINE.json in the cwd either way.
# Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/bench.sh
set -euo pipefail
cd "$(dirname "$0")/.."
exec scripts/run_main.sh graft.Bench

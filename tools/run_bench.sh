#!/bin/bash
# Bench leg via plain `java -cp` (sbt-free stdout): the LAST line printed
# on BOTH streams is the ONE bench JSON object (identical bytes to
# BENCH_FULL.json — per-query maps first, scalar adjudication fields
# last; r10 one-file contract).
#   tools/run_bench.sh [sfDir]
exec "$(dirname "$0")/run_verify.sh" "${1:-/root/testdata/sf0.1}" /tmp/bench_out graft.Bench

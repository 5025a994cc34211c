#!/bin/bash
# Bench leg via plain `java -cp` (sbt-free stdout): the LAST line printed
# is the driver contract JSON {"metric":"total",...} — no sbt trailer.
#   tools/run_bench.sh [sfDir]
exec "$(dirname "$0")/run_verify.sh" "${1:-/root/testdata/sf0.1}" /tmp/bench_out graft.Bench

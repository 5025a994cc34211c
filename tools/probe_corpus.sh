#!/bin/bash
# Round-start corpus drift probe: one JSON line per table with the SCANNED
# parquet schema and the loader-normalized schema. Run this before anything
# else each round; CorpusDriftSpec asserts the same contract in sbt test.
#   tools/probe_corpus.sh [sfDir]
exec "$(dirname "$0")/run_verify.sh" "${1:-/root/testdata/sf0.01}" ignored graft.CorpusProbe

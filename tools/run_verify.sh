#!/bin/bash
# Run a graft main directly with java (skips sbt startup, and — for the
# bench leg — keeps sbt's "[success] Total time" trailer out of stdout so
# the final line IS the Bench contract JSON). Usage:
#   tools/run_verify.sh [sfDir] [outDir] [mainClass]
#   tools/run_bench.sh  [sfDir]              (thin wrapper over this)
set -e
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
MAIN=${3:-graft.Verify}
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR="$SF"
exec java $OPENS -Xmx${GRAFT_XMX:-12g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$SF" "$OUT"

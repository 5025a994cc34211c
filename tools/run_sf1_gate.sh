#!/bin/bash
# Standing sf1 gate (r15, r14 verdict #7): the 10x scale step caught three
# defect classes at r14 that every smaller SF masked (non-total ORDER BY
# tie symmetry, DuckDB DECIMAL->DOUBLE mis-rounding past 2^53), so it runs
# at EVERY round close, not as a special effort.
#   tools/run_sf1_gate.sh [outDir]
# - regenerates /tmp/testdata/sf1 via graft.GenScale when absent
# - graft.Verify at sf1 (GRAFT_XMX honored; default 24g)
# - per-query DuckDB comparison under `timeout 900` PROCESS isolation
#   (one quadratic fixture-dial oracle must wedge only itself — the r14
#   sweep discipline; a timeout counts as a FAIL, never a skip)
# - bench at sf1 -> BENCH_sf1.json (BENCH_FULL.json, the sf0.1 artifact,
#   is snapshotted and restored around the run)
set -uo pipefail
cd "$(dirname "$0")/.."
SF1=${SF1_DIR:-/tmp/testdata/sf1}
OUT=${1:-/tmp/verify_sf1}
export GRAFT_XMX=${GRAFT_XMX:-24g}

if [ ! -d "$SF1" ]; then
  echo "== GenScale sf0.1 -> sf1 ($SF1) =="
  OPENS=""
  for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
           java.util java.util.concurrent java.util.concurrent.atomic \
           sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
    OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
  done
  java $OPENS -Xmx$GRAFT_XMX -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.GenScale /root/testdata/sf0.1 "$SF1" 10 || exit 1
fi

echo "== Verify at sf1 =="
tools/run_verify.sh "$SF1" "$OUT" | tail -2 || exit 1

echo "== Oracle compare (per-query isolation, timeout 900) =="
fails=0
for q in $(python3 -c "import json;print(' '.join(sorted(json.load(open('$OUT/oracle_sql.json')))))"); do
  if timeout 900 python3 tools/check_oracle.py "$SF1" "$OUT" --only="$q" 2>/dev/null \
      | tail -1 | grep -q ", 0 fail,"; then
    :
  else
    echo "SF1 GATE FAIL: $q"
    fails=$((fails+1))
  fi
done
echo "sf1 oracle gate: $fails failing queries"

echo "== Bench at sf1 -> BENCH_sf1.json =="
[ -f BENCH_FULL.json ] && cp BENCH_FULL.json /tmp/BENCH_FULL.sf01.bak
tools/run_bench.sh "$SF1" > /tmp/bench_sf1_stdout.txt 2>/dev/null
tail -1 /tmp/bench_sf1_stdout.txt > BENCH_sf1.json
[ -f /tmp/BENCH_FULL.sf01.bak ] && mv /tmp/BENCH_FULL.sf01.bak BENCH_FULL.json
python3 -c "import json;d=json.load(open('BENCH_sf1.json'));print('sf1 bench: %.1fs, %d queries, errors=%d' % (d['value'], len(d['queries']), d['errors']))"
exit $fails

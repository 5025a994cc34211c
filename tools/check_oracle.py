#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each Spark result parquet under OUTDIR/<name>/ and the oracle SQL from
OUTDIR/oracle_sql.json, runs the SQL in DuckDB over the same sf parquet
tables, sorts columns by name (as the driver does), and compares rows,
schema widths, and values exactly.

Usage: tools/check_oracle.py [sfDir] [outDir]
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    declared = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
    n_pass = n_fail = 0
    for name in declared:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_tbl = pq.read_table(files[0])
        cols = sorted(spark_tbl.column_names)
        spark_rows = [tuple(norm(r[c]) for c in cols) for r in spark_tbl.to_pylist()]
        if name not in oracle:
            print(f"SKIP {name}: rows-only check — {len(spark_rows)} rows")
            if len(spark_rows) == 0:
                print(f"  WARN {name}: zero rows");
            continue
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        dcols = sorted(duck.column_names)
        duck_rows = [tuple(norm(r[c]) for c in dcols) for r in duck.to_pylist()]
        if cols != dcols:
            print(f"FAIL {name}: columns spark={cols} duck={dcols}"); n_fail += 1; continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}"); n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(spark_rows)} rows differ; first at {i}:")
            print(f"  cols:  {cols}")
            print(f"  spark: {a}")
            print(f"  duck:  {b}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spark_rows)} rows")
            n_pass += 1
    missing = set(oracle) - set(declared)
    for m in sorted(missing):
        print(f"FAIL {m}: oracle declared but no spark output dir"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(declared)} declared")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

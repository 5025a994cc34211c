#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate — type-strict.

Reads each Spark result parquet under OUTDIR/<name>/ and the oracle SQL from
OUTDIR/oracle_sql.json, runs the SQL in DuckDB over the same sf parquet
tables, sorts columns by name (as the driver does), and compares:

  1. column name sets,
  2. Arrow schema TYPES per column (strict — decimal128(38,0) != int64,
     int32 != int64, float != double; timestamp unit differences allowed
     only between us/ns with identical tz),
  3. row counts,
  4. values exactly (after the type gate, so Decimal(n) == int(n) can no
     longer mask a schema drift the driver's rendered-row hash catches).

The r5 postmortem: seven oracles with un-cast integer SUMs returned DuckDB
HUGEINT where Spark wrote BIGINT; the old value-only comparator passed them
locally (`Decimal(n) == int(n)` is True in Python) while the driver's hash
gate failed all seven. Types are now a hard gate.

Usage: tools/check_oracle.py [sfDir] [outDir] [--types]
  --types  also print a per-query "TYPES <name>: col:spark_type=duck_type ..."
           line for every compared query (the drift-sweep artifact).
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

def type_key(t):
    """Canonical comparison key for an Arrow type. Strict by default;
    the one tolerated difference is timestamp precision us vs ns with the
    same tz (parquet writers disagree; values compare exactly anyway)."""
    import pyarrow as pa
    if pa.types.is_timestamp(t):
        unit = "us" if t.unit in ("us", "ns") else t.unit
        return f"timestamp[{unit},tz={t.tz}]"
    return str(t)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    show_types = "--types" in sys.argv
    # --only=q_a,q_b: compare just these queries (per-query isolation for
    # the sf1 gate, where a few fixture-dial oracles are quadratic in
    # DuckDB and need an external timeout)
    only = None
    for a in sys.argv[3:]:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
    con = duckdb.connect()
    for t in TABLES:
        # driver tables are single files; GenScale (sf1) writes Spark-style
        # directories of part files — glob those
        path = f"{sf}/{t}.parquet"
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    declared = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
    if only is not None:
        declared = [d for d in declared if d in only]
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
        stypes = {c: type_key(spark_tbl.schema.field(c).type) for c in cols}
        dtypes = {c: type_key(duck.schema.field(c).type) for c in cols}
        if show_types:
            print("TYPES %s: %s" % (name, " ".join(
                f"{c}:{stypes[c]}" + ("" if stypes[c] == dtypes[c] else f"!={dtypes[c]}")
                for c in cols)))
        drift = [c for c in cols if stypes[c] != dtypes[c]]
        if drift:
            print(f"FAIL {name}: TYPE DRIFT on {len(drift)} col(s):")
            for c in drift:
                print(f"  {c}: spark={stypes[c]} duck={dtypes[c]}")
            n_fail += 1
            continue
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
    if only is not None:
        missing &= only
    for m in sorted(missing):
        print(f"FAIL {m}: oracle declared but no spark output dir"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(declared)} declared")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each
SparkEntry.oracleSql in DuckDB over the same testdata parquet and compare
with the Verify parquet dump (columns sorted by name, rows sorted, values
compared exactly; floats compared bit-exactly unless --tol)."""
import json, sys, glob, math
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    def key(t):
        return tuple((v is None, str(v)) for v in t)
    return sorted(out, key=key), [cols[i] for i in idx]

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.execute(f"create view {name} as select * from read_parquet('{p}')")
    fails = []
    for name in sorted(oracle):
        try:
            spark_rel = con.sql(f"select * from read_parquet('{out_dir}/{name}/*.parquet')")
            s_rows, s_cols = canon(spark_rel.fetchall(), [c.lower() for c in spark_rel.columns])
            duck_rel = con.sql(oracle[name])
            d_rows, d_cols = canon(duck_rel.fetchall(), [c.lower() for c in duck_rel.columns])
        except Exception as e:
            fails.append(name); print(f"FAIL {name}: exec error {str(e)[:200]}"); continue
        if s_cols != d_cols:
            fails.append(name); print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}"); continue
        if len(s_rows) != len(d_rows):
            fails.append(name); print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}"); continue
        bad = 0
        for sr, dr in zip(s_rows, d_rows):
            for c, (a, b) in zip(s_cols, zip(sr, dr)):
                eq = (a == b) or (a is None and b is None)
                if not eq and isinstance(a, float) and isinstance(b, float):
                    eq = (math.isnan(a) and math.isnan(b)) or a == b
                if not eq:
                    if bad < 3:
                        print(f"  {name}.{c}: spark={a!r} duck={b!r}")
                    bad += 1
        if bad:
            fails.append(name); print(f"FAIL {name}: {bad} value mismatches / {len(s_rows)} rows")
        else:
            print(f"ok   {name} ({len(s_rows)} rows)")
    print(f"\n{len(oracle)-len(fails)}/{len(oracle)} queries match")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Regression test for compare_oracle.py's dtype strictness.

The round-6 driver red (q92_rolling_spikes) was a DuckDB HUGEINT from an
uncast windowed SUM landing in pandas as float64 against Spark's int64 —
equal Python values, diverging driver hash. The old float-tolerant local
compare certified it green. This test pins that the tool now FAILS the
uncast oracle and PASSES the cast one against the same int64 parquet.

Run: python3 tools/test_compare_oracle.py
"""
import json, os, shutil, subprocess, sys, tempfile
import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
TOOL = os.path.join(HERE, "compare_oracle.py")

def run_case(oracle_sql):
    work = tempfile.mkdtemp(prefix="cmp_oracle_test_")
    try:
        sf_dir = os.path.join(work, "sf")
        out_dir = os.path.join(work, "out")
        os.makedirs(sf_dir)
        os.makedirs(os.path.join(out_dir, "q_dtype"))
        con = duckdb.connect()
        # source table the oracle reads
        con.execute("create table t as select range::BIGINT x from range(5)")
        con.execute(
            f"copy t to '{sf_dir}/t.parquet' (format parquet)")
        # the 'Spark' side: int64 running sum, like ops/Quality.scala emits
        con.execute(
            "copy (select x, cast(sum(x) over (order by x) as bigint) s from t) "
            f"to '{out_dir}/q_dtype/part-0.parquet' (format parquet)")
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({"q_dtype": oracle_sql}, f)
        p = subprocess.run([sys.executable, TOOL, sf_dir, out_dir],
                           capture_output=True, text=True)
        return p.returncode, p.stdout + p.stderr
    finally:
        shutil.rmtree(work, ignore_errors=True)

def main():
    uncast = "select x, sum(x) over (order by x) s from t"   # HUGEINT -> float64
    cast = "select x, cast(sum(x) over (order by x) as bigint) s from t"
    # INT (int32) vs the dump's BIGINT: width delta within the int kind —
    # the driver hashes these equal (CORRECTNESS_r06: 14 such queries
    # green), so the local tool must NOT manufacture a red
    narrow = "select x, cast(sum(x) over (order by x) as int) s from t"
    rc_bad, out_bad = run_case(uncast)
    assert rc_bad != 0, f"uncast HUGEINT oracle must FAIL, got rc=0:\n{out_bad}"
    assert "dtype" in out_bad, f"failure must name the dtype mismatch:\n{out_bad}"
    rc_ok, out_ok = run_case(cast)
    assert rc_ok == 0, f"cast BIGINT oracle must PASS, got rc={rc_ok}:\n{out_ok}"
    rc_nw, out_nw = run_case(narrow)
    assert rc_nw == 0, f"int-width-only delta must PASS (driver hashes equal):\n{out_nw}"
    print("ok: HUGEINT->float64 fails; BIGINT passes; int-width delta passes")

if __name__ == "__main__":
    main()

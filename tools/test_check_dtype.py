#!/usr/bin/env python3
"""Fixture test for check.py's dtype strictness: a deliberately-uncast
oracle column (DuckDB HUGEINT -> pandas float64) against an int64 Spark
parquet must FAIL even though every value matches — this is the exact
class the driver's type-sensitive hash catches and the old tolerance
branch silently passed (VERDICT r10 finding #3).

Usage: python3 tools/test_check_dtype.py   (exits 0 iff both cases behave)
"""
import json, os, subprocess, sys, tempfile
import pyarrow as pa
import pyarrow.parquet as pq

here = os.path.dirname(os.path.abspath(__file__))
check = os.path.join(here, "check.py")

with tempfile.TemporaryDirectory() as tmp:
    sfdir = os.path.join(tmp, "sf"); outdir = os.path.join(tmp, "out")
    os.makedirs(sfdir); os.makedirs(outdir)
    # minimal table set check.py registers (views over one-row stubs)
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        pq.write_table(pa.table({"x": pa.array([1], pa.int64())}),
                       f"{sfdir}/{t}.parquet")
    # Spark side: int64 column, values 1..3
    os.makedirs(f"{outdir}/q_uncast")
    pq.write_table(pa.table({"k": pa.array([1, 2, 3], pa.int64())}),
                   f"{outdir}/q_uncast/part-0.parquet")
    os.makedirs(f"{outdir}/q_cast")
    pq.write_table(pa.table({"k": pa.array([1, 2, 3], pa.int64())}),
                   f"{outdir}/q_cast/part-0.parquet")
    # Oracle side: sum(x) over 3 one-row unions is HUGEINT in DuckDB ->
    # float64 in pandas when uncast; identical VALUES both cases.
    hugeint = ("SELECT sum(x) AS k FROM (SELECT 1 AS g, x FROM region "
               "UNION ALL SELECT 2, x FROM region UNION ALL SELECT 2, x "
               "FROM region UNION ALL SELECT 3, x FROM region UNION ALL "
               "SELECT 3, x FROM region UNION ALL SELECT 3, x FROM region"
               ") GROUP BY g")
    oracle = {"q_uncast": hugeint,
              "q_cast": hugeint.replace("sum(x)", "CAST(sum(x) AS BIGINT)")}
    json.dump(oracle, open(f"{outdir}/oracle_sql.json", "w"))

    r = subprocess.run([sys.executable, check, sfdir, outdir],
                       capture_output=True, text=True)
    out = r.stdout
    ok = (r.returncode != 0
          and "FAIL q_uncast" in out and "dtype mismatch" in out
          and "PASS q_cast" in out)
    print(out.strip())
    print("FIXTURE:", "PASS" if ok else "FAIL",
          "(uncast HUGEINT must fail dtype-strict, cast twin must pass)")
    sys.exit(0 if ok else 1)

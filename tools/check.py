#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's dumped
oracle_sql.json in DuckDB over the same sf parquet tables and diff against
the Spark parquet results (column-name-sorted, row-sorted, value-wise)."""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
import os
for t in TABLES:
    # driver testdata ships single files; Spark-derived dirs (MakeScale)
    # are directories of part files — glob those
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
    try:
        got = pq.read_table(f"{outdir}/{name}").to_pandas()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}"); fail += 1; continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
        fail += 1; continue
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fail += 1; continue
    ok = True
    for c in exp.columns:
        a, b = exp[c], got[c]
        # The driver's hash is dtype-sensitive: an integer column that
        # DuckDB returns as HUGEINT renders float64 in pandas and fails
        # the driver even when every value matches. Mirror that: an
        # int-vs-float dtype split is a FAIL here too (cast the oracle).
        if (a.dtype.kind in 'iu') != (b.dtype.kind in 'iu') and \
           (a.dtype.kind in 'iuf' and b.dtype.kind in 'iuf'):
            print(f"FAIL {name}: col {c} dtype mismatch: "
                  f"spark={b.dtype} oracle={a.dtype} "
                  f"(driver hash is type-sensitive; CAST the oracle)")
            ok = False; fail += 1; break
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            bad = ~((a.isna() & b.isna()) |
                    (abs(a.astype(float) - b.astype(float)) <= 1e-9 + 1e-9*abs(a.astype(float))))
        else:
            bad = a.astype(str) != b.astype(str)
        if bad.any():
            i = bad.idxmax()
            print(f"FAIL {name}: col {c} row {i}: spark={got[c][i]!r} oracle={exp[c][i]!r}")
            ok = False; fail += 1; break
    if ok:
        print(f"PASS {name} ({len(exp)} rows)")
print("RESULT:", "FAIL" if fail else "PASS", f"({len(oracle)-fail}/{len(oracle)})")
sys.exit(1 if fail else 0)

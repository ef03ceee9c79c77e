#!/usr/bin/env python3
"""Compare one query's Spark parquet against its oracle SQL, exactly."""
import sys, glob, duckdb
name = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_out"
con = duckdb.connect()
import os
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
sql = open(f"/tmp/oracle_sql/{name}.sql").read()
got = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchall()
got_cols = [c[0] for c in con.description]
exp = con.execute(sql).fetchall()
exp_cols = [c[0] for c in con.description]
if sorted(got_cols) != sorted(exp_cols):
    print(f"FAIL cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}"); sys.exit(1)
if len(got) != len(exp):
    print(f"FAIL rows spark={len(got)} oracle={len(exp)}"); sys.exit(1)
perm = [got_cols.index(c) for c in exp_cols]
for i, (g, e) in enumerate(zip(got, exp)):
    g = [g[j] for j in perm]
    for j, (a, b) in enumerate(zip(g, e)):
        if a != b:
            print(f"FAIL row {i} col {exp_cols[j]}: spark={a!r} oracle={b!r}"); sys.exit(1)
print(f"OK {name}: {len(got)} rows, cols {exp_cols}")

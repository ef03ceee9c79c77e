#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfDir] [outDir]
Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle SQL in DuckDB against the sfDir
tables, and compares: row count, column names, and values. The compare is
EXACT for all types (floats included) by design — the Det integer-cents
aggregation makes derived doubles bit-identical across engines, and the
driver's gate is an exact hash; a loose local check would hide real
driver failures.
"""
import sys, os, json, glob, math
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    d = f"{out}/{name}"
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output at {d}")
        fail += 1
        continue
    try:
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchall()
        got_cols = [c[0] for c in con.description]
        exp = con.execute(sql).fetchall()
        exp_cols = [c[0] for c in con.description]
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
        fail += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
        fail += 1
        continue
    # reorder spark cols to oracle col order, then compare row-by-row
    perm = [got_cols.index(c) for c in exp_cols]
    bad = None
    for i, (g, e) in enumerate(zip(got, exp)):
        g = [g[j] for j in perm]
        for j, (a, b) in enumerate(zip(g, e)):
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if a != b and not (math.isnan(a) and math.isnan(b)):
                    bad = (i, exp_cols[j], a, b, abs(a - b))
                    break
            else:
                bad = (i, exp_cols[j], a, b, None)
                break
        if bad:
            break
    if bad:
        i, c, a, b, d_ = bad
        print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r} diff={d_}")
        fail += 1
    else:
        print(f"OK   {name}: {len(got)} rows")
print(f"\n{'ALL OK' if fail == 0 else f'{fail} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fail else 0)

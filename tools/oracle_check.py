#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB on the same parquet tables and compare per-query.
Usage: oracle_check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, duckdb, math

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(rows, cols):
    # sort columns by name, then rows; normalize numerics
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    def cell(v):
        if isinstance(v, float):
            return round(v, 9)
        if hasattr(v, 'isoformat'):
            return v.isoformat()
        return v
    return sorted(tuple(cell(r[i]) for i in idx) for r in rows), [cols[i] for i in idx]

fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        d = con.execute(sql)
        dcols = [c[0] for c in d.description]
        drows = d.fetchall()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); fails += 1; continue
    s = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
    scols = [c[0] for c in s.description]
    srows = s.fetchall()
    dn, dc = norm(drows, dcols)
    sn, sc = norm(srows, scols)
    if dc != sc:
        print(f"FAIL {name}: columns spark={sc} duckdb={dc}"); fails += 1; continue
    if len(dn) != len(sn):
        print(f"FAIL {name}: rowcount spark={len(sn)} duckdb={len(dn)}"); fails += 1; continue
    if dn != sn:
        bad = [(a,b) for a,b in zip(sn,dn) if a!=b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {bad}"); fails += 1; continue
    print(f"OK   {name} ({len(sn)} rows)")
print(f"{'ALL OK' if fails==0 else str(fails)+' FAILURES'}")
sys.exit(1 if fails else 0)

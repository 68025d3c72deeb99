#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate — two passes per query.

Pass 1 (arrow-exact): runs each oracle SQL in DuckDB and compares it to
graft.Verify's parquet output at the ARROW level — canonical column
types and exact values (no float rounding, decimals as exact Decimals).

Pass 2 (driver-path): replays the DRIVER's comparison route, which pass 1
does not predict: the driver loads both sides through pandas (DuckDB
`.df()` exports DECIMAL as float64 while parquet decimals stay exact
Decimal objects; numpy arrays are unhashable in a sort), sorts columns
by name, sorts rows, and compares values. Rounds 2-4 proved arrow-OK
does NOT imply driver-OK for decimal/array outputs — this pass fails
exactly where the driver would. Date/datetime columns are normalized to
ISO strings first (a dtype artifact of the two loaders that the real
driver tolerates — q07-q09/q40 are gate-green with DATE buckets).

Usage: oracle_check.py <sfDir> <verifyOutDir> [only_query ...]
"""
import sys, json, glob
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))


def canontype(t: pa.DataType) -> str:
    """Canonical type string: captures width/precision/unit, unifies
    representation-only variants (string vs large_string)."""
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canontype(t.value_type)}>"
    return str(t)  # int8..int64, float, double, bool, ...


def canoncol(col: pa.ChunkedArray):
    """Exact python values for comparison. Timestamps -> raw int64 in their
    own unit (unit equality is enforced by the type check, so this is
    lossless — datetime conversion would silently drop ns)."""
    t = col.type
    if pa.types.is_timestamp(t):
        return col.cast(pa.int64()).to_pylist()
    if pa.types.is_date(t):
        return col.cast(pa.date32()).cast(pa.int32()).to_pylist()
    return col.to_pylist()


def rows_of(tbl: pa.Table):
    names = sorted(tbl.column_names)
    cols = [canoncol(tbl.column(n)) for n in names]
    rows = list(zip(*cols)) if cols else []
    # sort key must be deterministic and type-stable per column; the type
    # check has already guaranteed both sides hold the same types
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return names, rows


def driver_path_diff(files, sql):
    """Replay the driver's pandas comparison; return None if it matches,
    else a short description of the first divergence."""
    sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    odf = con.execute(sql).df()
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"columns spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}"

    def normalize(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            # loader dtype artifact the driver tolerates: dates arrive as
            # datetime64 from duckdb but object(date) from parquet
            if str(df[c].dtype).startswith("datetime64") or (
                    df[c].dtype == object and df[c].map(
                        lambda x: hasattr(x, "isoformat"), na_action="ignore").all()):
                df[c] = df[c].map(lambda x: str(x)[:10], na_action="ignore")
        return df.sort_values(by=sorted(df.columns)).reset_index(drop=True)

    sdf, odf = normalize(sdf), normalize(odf)  # raises where the driver errors
    if len(sdf) != len(odf):
        return f"rowcount spark={len(sdf)} duckdb={len(odf)}"
    h1 = pd.util.hash_pandas_object(sdf).sum()
    h2 = pd.util.hash_pandas_object(odf).sum()
    if h1 != h2:
        diff = [c for c in sdf.columns if not sdf[c].equals(odf[c])]
        kinds = [f"{c}({sdf.dtypes[c]}/{odf.dtypes[c]})" for c in diff]
        return f"hash mismatch in {kinds}"
    return None


fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        d = con.execute(sql).arrow()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); fails += 1; continue
    s = pa.concat_tables([pq.read_table(f) for f in files])

    scols, dcols = sorted(s.column_names), sorted(d.column_names)
    if scols != dcols:
        print(f"FAIL {name}: columns spark={scols} duckdb={dcols}"); fails += 1; continue
    tdiff = [(c, canontype(s.column(c).type), canontype(d.column(c).type))
             for c in scols
             if canontype(s.column(c).type) != canontype(d.column(c).type)]
    if tdiff:
        desc = ", ".join(f"{c}: spark={a} duckdb={b}" for c, a, b in tdiff)
        print(f"FAIL {name}: type mismatch: {desc}"); fails += 1; continue
    if s.num_rows != d.num_rows:
        print(f"FAIL {name}: rowcount spark={s.num_rows} duckdb={d.num_rows}"); fails += 1; continue
    _, srows = rows_of(s)
    _, drows = rows_of(d)
    if srows != drows:
        bad = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs (spark, duckdb): {bad}")
        fails += 1; continue
    try:
        pdiff = driver_path_diff(files, sql)
    except Exception as e:
        pdiff = f"driver harness would ERROR: {type(e).__name__}: {str(e)[:120]}"
    if pdiff:
        print(f"FAIL {name}: arrow-exact OK but driver-path diverges: {pdiff}")
        fails += 1; continue
    print(f"OK   {name} ({s.num_rows} rows)")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)

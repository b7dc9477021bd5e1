#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run each oracle SQL
in DuckDB over the same sf tables, load the Spark parquet output, sort
columns by name + rows, and compare cell-exact. Usage:
  python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # Harness-faithful ordering: the driver sorts the RAW frame first, so a
    # native array/object column pandas cannot lexsort must fail HERE too
    # (q83 round 5 escaped because this tool used to stringify before
    # sorting). The TypeError propagates to the caller as a per-query FAIL.
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df

def cells_equal(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b

fails, passes, rowsonly = [], [], []
for name in sorted(glob.glob(f"{outdir}/q*")):
    qname = name.split("/")[-1]
    files = glob.glob(f"{name}/*.parquet")
    if not files:
        fails.append((qname, "no parquet output"))
        continue
    spark_df = pq.read_table(files[0]).to_pandas()
    if qname not in oracle:
        rowsonly.append((qname, len(spark_df)))
        continue
    try:
        duck_df = con.sql(oracle[qname]).df()
    except Exception as e:
        fails.append((qname, f"oracle SQL error: {e}"))
        continue
    try:
        s, d = canon(spark_df), canon(duck_df)
    except TypeError as e:
        fails.append((qname, f"harness cannot canonicalize (unsortable raw column): {e}"))
        continue
    if list(s.columns) != list(d.columns):
        fails.append((qname, f"columns spark={list(s.columns)} duck={list(d.columns)}"))
        continue
    if len(s) != len(d):
        fails.append((qname, f"rowcount spark={len(s)} duck={len(d)}"))
        continue
    diff = None
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not cells_equal(a, b):
                diff = f"col {c} row {i}: spark={a!r} duck={b!r} (dtypes {s[c].dtype}/{d[c].dtype})"
                break
        if diff:
            break
    if diff:
        fails.append((qname, diff))
    else:
        passes.append((qname, len(s)))

print(f"PASS {len(passes)}  FAIL {len(fails)}  ROWS-ONLY {len(rowsonly)}")
for q, n in passes:
    print(f"  PASS {q} ({n} rows)")
for q, n in rowsonly:
    print(f"  ROWS-ONLY {q} ({n} rows)")
for q, msg in fails:
    print(f"  FAIL {q}: {msg}")
sys.exit(1 if fails else 0)

#!/bin/bash
# Per-query correctness loop: run one SparkEntry query via RunOne, capture
# its oracle SQL from the SQL_START/SQL_END markers, and compare against
# DuckDB exactly as the driver gate does. Usage:
#   tools/check_one.sh q158_curation_pipeline2 /root/testdata/sf0.01
set -e
NAME="$1"; SF="${2:-/root/testdata/sf0.01}"
OUT="/tmp/check_one_${NAME}"
rm -rf "$OUT"
sbt -batch "runMain graft.RunOne $NAME $SF $OUT" 2>&1 | tee /tmp/check_one_log.txt | tail -3
sed -n '/SQL_START/,/SQL_END/p' /tmp/check_one_log.txt \
  | sed 's/^\[info\] //' | sed '1d;$d' > "$OUT/oracle.sql"
python3 - "$SF" "$OUT" <<'EOF'
import sys, glob, duckdb, pandas as pd, pyarrow.parquet as pq
sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
sql = open(f"{outdir}/oracle.sql").read()
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df
spark = canon(pq.read_table(glob.glob(f"{outdir}/part-*.parquet")[0]).to_pandas())
ora = canon(con.sql(sql).df())
ok_rows = len(spark) == len(ora)
ok_schema = list(spark.columns) == list(ora.columns)
ok = ok_rows and ok_schema and spark.astype(str).equals(ora.astype(str))
print(f"rows spark={len(spark)} oracle={len(ora)} schema_match={ok_schema} MATCH={ok}")
if not ok and ok_schema and ok_rows:
    for c in spark.columns:
        neq = (spark[c].astype(str) != ora[c].astype(str))
        if neq.any():
            i = neq.idxmax()
            print(f"first diff col={c} row={i} spark={spark[c][i]} oracle={ora[c][i]}")
            break
sys.exit(0 if ok else 1)
EOF

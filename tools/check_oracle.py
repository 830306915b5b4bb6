#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
under OUTDIR, run the oracle SQL in DuckDB over the same sf dir and
compare (sorted-by-name columns, stringified values)."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}"))
fails = 0
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO OUTPUT"); fails += 1; continue
    tbl = pq.read_table(files[0])
    cols = sorted(tbl.column_names)
    spark_rows = [tuple(str(tbl.column(c)[i].as_py()) for c in cols)
                  for i in range(tbl.num_rows)]
    if name not in oracle:
        print(f"{name}: rows-only ({tbl.num_rows} rows)"); continue
    try:
        res = con.execute(oracle[name])
        duck_cols = [d[0] for d in res.description]
        duck = res.fetchall()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    duck_rows = [tuple(str(r[i]) for i in order) for r in duck]
    if sorted(duck_cols) != cols:
        print(f"{name}: SCHEMA MISMATCH spark={cols} duck={sorted(duck_cols)}"); fails += 1; continue
    if spark_rows == duck_rows:
        print(f"{name}: OK ({len(spark_rows)} rows)")
    else:
        fails += 1
        print(f"{name}: MISMATCH spark={len(spark_rows)} duck={len(duck_rows)} rows")
        sset, dset = set(spark_rows), set(duck_rows)
        only_s = list(sset - dset)[:3]; only_d = list(dset - sset)[:3]
        if only_s: print(f"   spark-only: {only_s}")
        if only_d: print(f"   duck-only:  {only_d}")
        if not only_s and not only_d: print("   (same set, different order)")
print(f"\n{fails} failures / {len(names)} queries")

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare (sorted columns, sorted rows)
against the Spark parquet dumps in the verify outDir. Usage:
    python3 check_oracle.py <sfDir> <outDir>
"""
import duckdb, json, sys, math

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

sqls = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(sqls):
    try:
        orc = con.execute(sqls[name]).fetch_df()
        mine = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetch_df()
        # sort columns by name (driver behavior), normalize
        orc = orc.reindex(sorted(orc.columns), axis=1)
        mine = mine.reindex(sorted(mine.columns), axis=1)
        if list(orc.columns) != list(mine.columns):
            print(f"{name}: COLUMN MISMATCH oracle={list(orc.columns)} mine={list(mine.columns)}")
            fails += 1
            continue
        def norm(df):
            rows = [tuple("NULL" if (v is None or (isinstance(v, float) and math.isnan(v))) else str(v)
                          for v in row) for row in df.itertuples(index=False)]
            return sorted(rows)
        a, b = norm(orc), norm(mine)
        if a == b:
            print(f"{name}: OK ({len(a)} rows)")
        else:
            fails += 1
            print(f"{name}: MISMATCH oracle_rows={len(a)} mine_rows={len(b)}")
            onlya = [r for r in a if r not in set(b)][:3]
            onlyb = [r for r in b if r not in set(a)][:3]
            for r in onlya: print(f"   oracle-only: {str(r)[:220]}")
            for r in onlyb: print(f"   mine-only  : {str(r)[:220]}")
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {str(e)[:220]}")
print(f"\n{'ALL OK' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)

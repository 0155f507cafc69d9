#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify output
(parquet per query + oracle_sql.json), runs each oracle SQL in DuckDB over
the same sf dir, and compares values column-sorted, exact."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    d = f"{outdir}/{name}"
    if not os.path.isdir(d):
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    files = glob.glob(f"{d}/*.parquet")
    spark_tbl = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
    try:
        duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails.append(name); continue
    sc = sorted(spark_tbl.column_names); dc = sorted(duck_tbl.column_names)
    if sc != dc:
        print(f"FAIL {name}: columns {sc} vs {dc}"); fails.append(name); continue
    s = spark_tbl.select(sc).to_pylist(); dk = duck_tbl.select(sc).to_pylist()
    if len(s) != len(dk):
        print(f"FAIL {name}: rows {len(s)} vs {len(dk)}"); fails.append(name); continue
    bad = None
    for i, (a, b) in enumerate(zip(s, dk)):
        if a != b:
            bad = (i, a, b); break
    if bad:
        print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
        fails.append(name)
    else:
        print(f"OK   {name} ({len(s)} rows)")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} passed")
sys.exit(1 if fails else 0)

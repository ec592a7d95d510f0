#!/usr/bin/env python3
"""Time the DuckDB oracle suite against an SF directory — the baseline
side of the per-SF bench ratio recorded in PERF_NOTES. Usage:
time_oracle.py <sfDir> <oracleSqlJson> [namesCsv]"""
import sys, json, time
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
import os
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p  # Spark dir or flat file
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(oracle_path))
times, total = {}, 0.0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        n = len(con.execute(sql).fetchall())
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt
        print(f"{name}: {dt:.2f} s ({n} rows)", flush=True)
    except Exception as e:
        times[name] = -1.0
        print(f"{name}: ERROR {e}", flush=True)
print(json.dumps({"metric": "oracle_total", "value": round(total, 2),
                  "unit": "sec", "queries": times, "sf": sfdir}))

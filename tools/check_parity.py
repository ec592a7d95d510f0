#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run each oracle SQL
from oracle_sql.json in DuckDB against the sf tables, and compare with the
Spark result parquet dumped by graft.Verify (sorted columns, sorted rows,
exact values). Usage: check_parity.py <sfDir> <verifyOutDir>"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        exp = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetch_arrow_table()
    ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
    if ecols != gcols:
        print(f"FAIL {name}: cols {gcols} != {ecols}"); fail += 1; continue
    # dtype-strict: the driver's hash gate is type-sensitive (a DuckDB
    # HUGEINT vs Spark BIGINT hash-mismatches even when values agree —
    # q38 round 3, q52 round 6), but Python's == calls 99 == 99.0 equal.
    # Compare Arrow types up front so that class can never pass locally.
    etypes = {c: str(exp.schema.field(c).type) for c in ecols}
    gtypes = {c: str(got.schema.field(c).type) for c in gcols}
    WIDEN = {"int8": "int64", "int16": "int64", "int32": "int64",
             "float": "double", "large_string": "string"}
    dtbad = [(c, gtypes[c], etypes[c]) for c in ecols
             if WIDEN.get(gtypes[c], gtypes[c]) != WIDEN.get(etypes[c], etypes[c])]
    if dtbad:
        for c, g, e in dtbad:
            print(f"FAIL {name}: dtype {c}: spark {g} != oracle {e}")
        fail += 1; continue
    def rows(tbl):
        cols = [tbl.column(c).to_pylist() for c in sorted(tbl.column_names)]
        return sorted(zip(*cols), key=lambda r: tuple((v is None, str(type(v)), v) for v in r))
    er, gr = rows(exp), rows(got)
    if len(er) != len(gr):
        print(f"FAIL {name}: rows {len(gr)} != {len(er)}"); fail += 1; continue
    bad = None
    for i, (a, b) in enumerate(zip(gr, er)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if x != y and not (math.isnan(x) and math.isnan(y)):
                    bad = (i, x, y); break
            elif x != y:
                bad = (i, x, y); break
        if bad: break
    if bad:
        print(f"FAIL {name}: row {bad[0]}: got {bad[1]!r} exp {bad[2]!r}")
        print(f"  got: {gr[bad[0]]}\n  exp: {er[bad[0]]}")
        fail += 1
    else:
        print(f"OK   {name}: {len(gr)} rows")
print("ALL OK" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against DuckDB oracles (sorted-column, order-insensitive multiset compare)."""
import sys, json, glob, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no engine output"); fails += 1; continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    edf = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
    ocols = sorted(odf.columns); ecols = sorted(edf.columns)
    if ocols != ecols:
        print(f"FAIL {name}: schema {ecols} vs oracle {ocols}"); fails += 1; continue
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    e = edf[ecols].sort_values(ecols).reset_index(drop=True)
    if len(o) != len(e):
        print(f"FAIL {name}: rows {len(e)} vs oracle {len(o)}"); fails += 1; continue
    bad = None
    for c in ocols:
        ov, ev = o[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(ov, ev)):
            if isinstance(a, float) and isinstance(b, float):
                if not (a == b or (math.isnan(a) and math.isnan(b))):
                    bad = (c, i, a, b); break
            elif a != b:
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        print(f"FAIL {name}: col {bad[0]} row {bad[1]}: engine={bad[3]!r} oracle={bad[2]!r}")
        fails += 1
    else:
        print(f"OK   {name}: {len(e)} rows")
sys.exit(1 if fails else 0)

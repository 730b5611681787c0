#!/usr/bin/env python3
"""Real-client validation for the from-scratch SQLite containers (GPKG /
MBTiles): opens each file with Python's bundled sqlite3 (a real SQLite
build), runs PRAGMA integrity_check, and exercises typed reads + INSERT.

Usage: python3 tools/sqlite_check.py file.gpkg [file.mbtiles ...]

This is the adjudicator that caught two bugs the in-repo re-parser spec
could not: (1) records omitted the NULL slot for INTEGER PRIMARY KEY
columns, shifting every attribute by one for real clients; (2) TEXT /
composite PRIMARY KEYs declared without their sqlite_autoindex b-trees made
integrity_check report "database disk image is malformed".
"""
import sqlite3, sys

fails = 0
for path in sys.argv[1:]:
    con = sqlite3.connect(path)
    cur = con.cursor()
    ic = cur.execute("PRAGMA integrity_check").fetchall()
    ok = ic == [("ok",)]
    print(f"{path}: integrity_check={ic[0][0] if ic else '?'}")
    tables = [r[0] for r in cur.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")]
    for t in tables:
        try:
            n = cur.execute(f'SELECT count(*) FROM "{t}"').fetchone()[0]
            print(f"  {t}: {n} rows")
        except Exception as e:
            print(f"  {t}: READ FAIL {e}")
            ok = False
    try:  # a live INSERT exercises autoindex + sqlite_sequence machinery
        t = "gpkg_contents" if "gpkg_contents" in tables else "metadata"
        if t == "gpkg_contents":
            cur.execute("INSERT INTO gpkg_contents(table_name, data_type)"
                        " VALUES ('zz_probe','features')")
        else:
            cur.execute("INSERT INTO metadata(name, value) VALUES ('zz','1')")
        con.rollback()
        print("  insert probe: ok")
    except Exception as e:
        print(f"  insert probe FAIL: {e}")
        ok = False
    con.close()
    if not ok:
        fails += 1
sys.exit(1 if fails else 0)

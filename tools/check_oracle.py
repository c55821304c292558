#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Loads each <name> result parquet, runs oracle_sql.json[<name>] in DuckDB
with the sf tables registered, sorts columns by name + rows, compares.
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING  {name}"); fail += 1; continue
    try:
        mine = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        want = con.sql(sql).df()
        mine = mine.reindex(sorted(mine.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        schema_ok = list(mine.columns) == list(want.columns)
        mine_s = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
        want_s = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        rows_ok = len(mine_s) == len(want_s)
        # value compare: exact on strings/ints, tolerant-free on floats
        vals_ok = rows_ok and schema_ok and mine_s.astype(str).equals(want_s.astype(str))
        if vals_ok:
            print(f"OK       {name} rows={len(mine_s)}"); ok += 1
        else:
            print(f"MISMATCH {name} rows={len(mine_s)}/{len(want_s)} schema_ok={schema_ok} cols mine={list(mine.columns)} want={list(want.columns)}")
            if rows_ok and schema_ok:
                diff = (mine_s.astype(str) != want_s.astype(str))
                bad = diff.any(axis=1)
                print(mine_s[bad].head(3)); print(want_s[bad].head(3))
            fail += 1
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1
print(f"\n{ok} ok, {fail} failed")

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <sfdir> <verify_out>

For each query in <verify_out>/oracle_sql.json: run the SQL in DuckDB
(with one view per testdata table), load the Spark parquet result, sort
columns by name, and compare values (exact, after canonicalising
floats/timestamps to strings).
"""
import json, sys, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = bad = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            bad += 1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            bad += 1; continue
        e = exp.astype(str).values.tolist()
        g = got.astype(str).values.tolist()
        if sorted(map(tuple, e)) != sorted(map(tuple, g)):
            ne = 0
            for i, (a, b) in enumerate(zip(sorted(map(tuple, e)), sorted(map(tuple, g)))):
                if a != b:
                    if ne < 3: print(f"  diff[{i}]: exp={a} got={b}")
                    ne += 1
            print(f"FAIL {name}: {ne} differing rows of {len(exp)}")
            bad += 1; continue
        ok += 1
        print(f"ok   {name} ({len(exp)} rows)")
    except Exception as ex:
        print(f"ERR  {name}: {str(ex)[:300]}")
        bad += 1
print(f"\n{ok} ok, {bad} failed of {len(oracle)}")
sys.exit(1 if bad else 0)

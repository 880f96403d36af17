#!/usr/bin/env python3
"""Generate VALUES-literal DuckDB oracle SQL for queries whose Spark
side is deterministic but not SQL-derivable from the parquet tables
(supplier pipelines over the reference sample captures, hash-stub
outputs). Reads the graft.Verify dump and prints one oracle per query.

Usage: after `runMain graft.Verify <sfDir> /tmp/verify_out`:
    python3 tools/gen_values_oracle.py /tmp/verify_out q49_midocean_unified ...

The literals pin the outputs the ScalaTest golden specs already
assert; regenerate ONLY after intentionally changing a pipeline's
semantics, and re-check the golden specs agree.
"""
import sys

import duckdb
import pandas as pd


def lit(v, dtype):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if pd.api.types.is_bool_dtype(dtype):
        return "true" if v else "false"
    if pd.api.types.is_integer_dtype(dtype):
        return str(int(v))
    if pd.api.types.is_float_dtype(dtype):
        return repr(float(v))
    s = str(v).replace("'", "''")
    return f"'{s}'"


def oracle_for(out_dir, name):
    df = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    cols = list(df.columns)
    rows = []
    for _, r in df.iterrows():
        vals = ", ".join(lit(r[c], df[c].dtype) for c in cols)
        rows.append(f"        ({vals})")
    body = ",\n".join(rows)
    collist = ", ".join(cols)
    order = cols[0]
    return (f"      SELECT * FROM (VALUES\n{body}\n"
            f"      ) AS t({collist})\n      ORDER BY {order}")


if __name__ == "__main__":
    out_dir = sys.argv[1]
    for name in sys.argv[2:]:
        print(f"=== {name}")
        print(oracle_for(out_dir, name))

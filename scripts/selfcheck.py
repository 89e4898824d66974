#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark parquet output written by
graft.Verify, sort columns by name, and compare values exactly.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def frame_sig(df):
    df = df[sorted(df.columns)]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # testdata tables are single files; rehearsal corpora (ScaleRehearsal)
        # write Spark DIRECTORIES named <t>.parquet — glob their parts
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.IOException:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            actual = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            n_fail += 1
            continue
        if sorted(expected.columns) != sorted(actual.columns):
            print(f"FAIL {name}: columns {sorted(actual.columns)} vs oracle {sorted(expected.columns)}")
            n_fail += 1
            continue
        if len(expected) != len(actual):
            print(f"FAIL {name}: rows {len(actual)} vs oracle {len(expected)}")
            n_fail += 1
            continue
        es, as_ = frame_sig(expected), frame_sig(actual)
        if es != as_:
            diffs = [(i, a, e) for i, (a, e) in enumerate(zip(as_, es)) if a != e][:3]
            print(f"FAIL {name}: value mismatch; first diffs {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(expected)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

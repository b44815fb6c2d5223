#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare (rows/schema/values) to the
parquet dumped by graft.Verify. Usage: check.py <sfDir> <verifyOutDir>"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    def c(v):
        if isinstance(v, float):
            if math.isnan(v): return "NaN"
            return repr(v)
        return str(v)
    return sorted([tuple(c(v) for v in r) for r in rows])

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            mine = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            mine_cols = sorted(mine.columns)
            mine_rows = canon(mine[mine_cols].itertuples(index=False, name=None))
            ref = con.execute(sql).fetchdf()
            ref_cols = sorted(ref.columns)
            ref_rows = canon(ref[ref_cols].itertuples(index=False, name=None))
            if mine_cols != ref_cols:
                print(f"FAIL {name}: cols {mine_cols} vs {ref_cols}"); n_bad += 1
            elif mine_rows != ref_rows:
                diff = [(a, b) for a, b in zip(mine_rows, ref_rows) if a != b][:3]
                print(f"FAIL {name}: {len(mine_rows)} vs {len(ref_rows)} rows; first diffs: {diff}")
                n_bad += 1
            else:
                print(f"OK   {name} ({len(mine_rows)} rows)"); n_ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}"); n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

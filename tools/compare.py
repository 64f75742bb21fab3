#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle differential gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the oracle SQL in DuckDB against the fixture tables, sort columns
by name, sort rows, and compare cell-by-cell (exact; this is stricter
than any plausible driver tolerance).
"""
import json, sys, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = []
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}")
            fails.append(name)
            continue
        got = canon(con.execute(
            f"FROM read_parquet({files!r})").fetchdf())
        want = canon(con.execute(oracle[name]).fetchdf())
        status = None
        if list(got.columns) != list(want.columns):
            status = f"SCHEMA {list(got.columns)} vs {list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWS {len(got)} vs {len(want)}"
        else:
            diff = (got.astype(str) != want.astype(str))
            ndiff = int(diff.values.sum())
            if ndiff:
                cells = [(r, c) for r, c in zip(*diff.values.nonzero())]
                r, c = cells[0]
                status = (f"CELLS {ndiff} differ; first at row {r} "
                          f"col {got.columns[c]}: "
                          f"{got.iat[r, c]!r} vs {want.iat[r, c]!r}")
        if status:
            print(f"FAIL     {name}: {status}")
            fails.append(name)
        else:
            print(f"OK       {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - len(fails)}/{len(oracle)} match")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

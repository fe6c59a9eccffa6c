#!/usr/bin/env python3
"""Measure the DuckDB baseline for every oracle query at a given sf dir.

Usage: python3 tools/duckdb_baseline.py <oracle_sql.json> <sf_dir>
Prints one JSON line: {"total": sec, "queries": {name: sec}}.
Warm timing: each query runs once uncounted, then once timed.
"""
import duckdb, json, time, sys, os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings", "events"]


def main():
    oracle_path, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table directory
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    times = {}
    for name in sorted(oracle):
        con.execute(oracle[name]).fetchall()
        t0 = time.time()
        con.execute(oracle[name]).fetchall()
        times[name] = round(time.time() - t0, 4)
    print(json.dumps({"total": round(sum(times.values()), 3), "queries": times}))


if __name__ == "__main__":
    main()

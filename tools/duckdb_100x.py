#!/usr/bin/env python3
"""DuckDB side of the 100x-rung pairing: per-query SUBPROCESS isolation
(r10 lesson: one OOM wedges the process allocator for every later
connection) with warm timing (1 uncounted + 1 timed) per query.

Usage: python3 tools/duckdb_100x.py <oracle_sql.json> <sf_dir> <q1,q2,...>
Prints one JSON line {"total": sec, "queries": {...}}; a query that
fails (OOM / timeout) reports null.
"""
import json, os, subprocess, sys, time

WORKER = """
import duckdb, json, sys, time, os
oracle_path, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
con.execute("PRAGMA disable_progress_bar")
for t in ["documents", "embeddings", "region", "nation", "customer",
          "supplier", "part", "orders", "lineitem", "events"]:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.isdir(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
sql = json.load(open(oracle_path))[name]
# Arrow materialization (r12): the Spark side consumes results via a
# noop datasource write (full compute, no driver transfer); fetchall()
# would charge DuckDB per-row Python tuple conversion — at the 100x
# relational heavies' multi-million-row results that's seconds of pure
# harness overhead. Columnar Arrow fetch is the fair equivalent.
con.execute(sql).arrow()
t0 = time.time()
con.execute(sql).arrow()
print(json.dumps({"t": round(time.time() - t0, 4)}))
"""


def main():
    oracle, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    times = {}
    for name in names:
        try:
            out = subprocess.run(
                [sys.executable, "-c", WORKER, oracle, sf_dir, name],
                capture_output=True, text=True, timeout=600)
            times[name] = (json.loads(out.stdout.strip().splitlines()[-1])["t"]
                           if out.returncode == 0 else None)
        except Exception:
            times[name] = None
        print(f"[100x] {name} -> {times[name]}", file=sys.stderr)
    ok = [v for v in times.values() if v is not None]
    print(json.dumps({"total": round(sum(ok), 3), "queries": times}))


if __name__ == "__main__":
    main()

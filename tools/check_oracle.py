#!/usr/bin/env python3
"""Local mirror of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dir written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf parquet tables, and
compares: row count, column names (sorted), and canonicalized cell values.
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings", "events"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    # decimals, dates, timestamps, ints, strings -> str
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.9g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    data = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    return names, data


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        # preserve spark's written row order: read the single coalesced file
        s_names, s_rows = rows_of(con.sql(f"SELECT * FROM read_parquet('{files[0]}')"))
        try:
            d_names, d_rows = rows_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        if s_names != d_names:
            print(f"FAIL {name}: columns {s_names} != {d_names}")
            n_fail += 1
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows {len(s_rows)} != {len(d_rows)}")
            n_fail += 1
        elif s_rows != d_rows:
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
            print(f"FAIL {name}: first diff row {bad}: spark={s_rows[bad]} duckdb={d_rows[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

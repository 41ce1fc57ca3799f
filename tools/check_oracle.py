"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row count + schema + order-insensitive values,
and prints a per-query verdict. Usage:

    python tools/check_oracle.py                  # all queries
    python tools/check_oracle.py --names a,b,c    # subset
    python tools/check_oracle.py --sf /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Queries whose correct answer is legitimately empty at the test SF. Any OTHER
# query that returns zero rows is flagged VACUOUS even if it matches the oracle:
# a 0=0 comparison exercises nothing (tpch_q4 was silently vacuous rounds 2-4
# because its date window matched no fixture rows — this guard makes that loud).
EMPTY_OK: frozenset = frozenset()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def df_to_rows(cols, records):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm_cell(r[i]) for i in order) for r in records]
    rows.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], rows


def compare(name, spark_df, con, sql):
    s_cols = spark_df.columns
    s_records = [tuple(r) for r in spark_df.collect()]
    res = con.sql(sql)
    d_cols = res.columns
    d_records = res.fetchall()
    ok = True
    msgs = []
    if sorted(s_cols) != sorted(d_cols):
        ok = False
        msgs.append(f"schema: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    if len(s_records) != len(d_records):
        ok = False
        msgs.append(f"rows: spark={len(s_records)} duckdb={len(d_records)}")
    if ok and not s_records and name not in EMPTY_OK:
        ok = False
        msgs.append(
            "VACUOUS: both sides returned 0 rows — the comparison proves nothing; "
            "widen the query's predicate or add the name to EMPTY_OK if emptiness "
            "is the point"
        )
    if ok:
        _, s_rows = df_to_rows(s_cols, s_records)
        _, d_rows = df_to_rows(d_cols, d_records)
        mismatches = 0
        for a, b in zip(s_rows, d_rows):
            if a != b:
                close = all(
                    (x == y)
                    or (
                        isinstance(x, float)
                        and isinstance(y, float)
                        and abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
                    )
                    for x, y in zip(a, b)
                )
                mismatches += 1
                if mismatches <= 3:
                    msgs.append(f"  {'~near' if close else 'DIFF'}: spark={a!r} duckdb={b!r}")
        if mismatches:
            ok = False
            msgs.insert(0, f"values: {mismatches}/{len(s_rows)} rows differ")
    return ok, msgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from database_anonymiser_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names.split(",") if args.names else list(qs)

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            if name in oracles:
                ok, msgs = compare(name, df, con, oracles[name])
                dt = time.time() - t0
                if ok:
                    n_pass += 1
                    print(f"PASS  {name} ({dt:.1f}s)")
                else:
                    n_fail += 1
                    print(f"FAIL  {name} ({dt:.1f}s)")
                    for m in msgs[:6]:
                        print(f"      {m}")
            else:
                n = df.count()
                n_rows_only += 1
                print(f"ROWS  {name}: {n} rows ({time.time()-t0:.1f}s)")
        except Exception:
            n_fail += 1
            print(f"ERROR {name}")
            traceback.print_exc(limit=3)
        finally:
            spark.catalog.clearCache()  # drop any per-query internal caches
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

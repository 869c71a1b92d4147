"""Local differential harness mimicking the driver's correctness gate:
run every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compare row-count, schema (column names), and
order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}" if abs(v) < 1e15 else repr(v)
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def canon_pandas(pdf):
    """Driver-style normalization: materialize through pandas (the path a
    harness built on ``DataFrame.toPandas()`` / ``duckdb.sql().df()`` takes)
    and stringify each cell with plain ``str``.

    This is the normalization under which the four CORRECTNESS_r03 hash
    mismatches reproduce: DuckDB HUGEINT (``sum`` over INTEGER/BIGINT)
    cannot be represented by numpy, so ``.df()`` silently converts it to
    float64 — ``str`` then yields '1234.0' against Spark's int64 '1234',
    while row counts and column names still match.  Running BOTH this and
    the fetchall-style :func:`canon` keeps every future oracle honest under
    either materialization."""
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        cells = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                cells.append("∅")
            elif isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
                # Spark DATE survives toPandas as datetime.date while DuckDB
                # .df() widens it to a midnight Timestamp; the driver proved
                # DATE columns hash equal (full_outer_join_daily_recon green
                # r3), so canonicalize instead of false-flagging
                cells.append(f"{v} 00:00:00")
            elif isinstance(v, float):
                # deliberately NO precision-forgiving %.6g here: the driver's
                # stringification keeps the float dtype visible ('1234.0' vs
                # '1234'), which is how HUGEINT→float64 divergence shows up —
                # repr is the faithful, stricter simulation
                cells.append(repr(v))
            else:
                cells.append(str(v))
        out.append(tuple(cells))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from pipeflow_spark.session import get_spark

    spark = get_spark("oracle_check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            s_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:200]}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(s_rows)} rows, {time.monotonic()-t0:.1f}s) [no oracle]")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols, d_rows = rel.columns, rel.fetchall()
            d_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema {sorted(s_cols)} != {sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} != {len(d_rows)}")
        if not problems:
            cs, cd = canon(s_rows, s_cols), canon(d_rows, d_cols)
            if cs != cd:
                diff = next((i, a, b) for i, (a, b) in enumerate(zip(cs, cd)) if a != b)
                problems.append(f"values differ at sorted-row {diff[0]}: spark={diff[1]} duck={diff[2]}")
        if not problems:
            ps, pd_ = canon_pandas(s_pdf), canon_pandas(d_pdf)
            if ps != pd_:
                diff = next((i, a, b) for i, (a, b) in enumerate(zip(ps, pd_)) if a != b)
                problems.append(
                    f"pandas-normalized values differ at sorted-row {diff[0]}: "
                    f"spark={diff[1]} duck={diff[2]}"
                )
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"PASS  {name} ({len(s_rows)} rows, {time.monotonic()-t0:.1f}s)")

    print(f"\n{ran - len(failures)}/{ran} ok; failures: {failures or 'none'}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

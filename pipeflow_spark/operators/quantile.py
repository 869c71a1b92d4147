"""Bounded-state histogram quantiles: HDR-style log2 buckets, integer-exact.

Reference analog: none — PipeFlow has no percentile ops; this is north-rule
observability surface (windowed latency p50/p95/p99 over unbounded streams)
plus the batch twin.  The repo's ``reply_latency_profile`` computes EXACT
percentiles — correct, but exact quantiles need all values per group (a full
sort or `percentile` buffer).  At 10^12 turns the right tool is a **mergeable
fixed-size sketch**; this module uses the HdrHistogram/DDSketch family shape
(log-scaled buckets, counts only) with one twist that makes it *oracle-able*:

**the bucket function is pure int64 arithmetic** — no ``log()`` whose last
ulp could flip a boundary between engines:

* ``x``       = value scaled to an integer grid (default ×100, ≥ 1)
* ``b``       = ``length(bin(x))``  (bit length — string length of the JVM/
                DuckDB binary rendering, identical by construction)
* ``m``       = ``x >> max(b-4, 0)``  (top 4 mantissa bits)
* bucket id   = ``b*16 + m``  (monotonic in x)
* upper bound = ``x`` exact when ``b ≤ 4``; else ``((m+1) << (b-4)) - 1``

Sub-bucketing on 4 mantissa bits gives relative error ≤ 1/8 (estimate is the
bucket upper bound: ``true ≤ est ≤ true·(1+1/8)``), with ≤ 16 buckets per
octave and ≤ ~1000 buckets total for the full int64 range — the per-group
state is a tiny constant regardless of row count, and buckets merge by adding
counts (Agarwal et al., "Mergeable Summaries", PODS 2012 posture, same as
``heavy.py``).

Rank selection is integer-exact too: the p-th percentile threshold is
``(n*p + 99) div 100`` (= ceil(n·p/100) without the float ``0.95*n`` boundary
hazard), and the estimate is the smallest bucket whose cumulative count
reaches it.

Scale shape: one groupBy (keys, bucket) with map-side combine — the only
data-sized shuffle; the cumulative window then runs over ≤ ~1000 rows per
key.  Streaming: the same bucket expression under ``groupBy(window(ts), …)``
keeps per-window state at the bucket count, not the value count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scaled_value(col: Column, scale: int = 100) -> Column:
    """Value → int64 grid (×scale, rounded).  Callers filter ``>= 1``."""
    return F.round(col * scale).cast("long")


def bucket_cols(x_sql: str = "x") -> tuple[Column, Column]:
    """(bucket_id, bucket_upper_bound) over the int64 column named by
    ``x_sql`` — pure int64 ops, see module docstring.  Built as SQL exprs
    because the pyspark ``shiftright``/``shiftleft`` wrappers only accept
    Python-int shift amounts, and the shift here is itself a column."""
    b = f"length(bin({x_sql}))"
    bid = F.expr(
        f"cast({b} * 16 + shiftright({x_sql}, greatest({b} - 4, 0)) as bigint)"
    )
    ub = F.expr(
        f"cast(case when {b} <= 4 then {x_sql}"
        f" else shiftleft(shiftright({x_sql}, {b} - 4) + 1, {b} - 4) - 1 end as bigint)"
    )
    return bid, ub


def hist_quantiles(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    percents: tuple[int, ...] = (50, 95, 99),
    scale: int = 100,
) -> DataFrame:
    """Per-``keys`` histogram percentiles of ``value_col``.

    Returns one row per key group with ``n`` and a ``p{p}`` column per
    requested integer percent — each the bucket-upper-bound estimate scaled
    back to the value domain (``true ≤ p{p} ≤ true·1.125``), plus
    ``n_buckets`` (the state-size gauge: what a streaming window would hold).
    """
    x = scaled_value(F.col(value_col), scale)
    bid, ub = bucket_cols("x")
    bucketed = (
        df.select(*keys, x.alias("x"))
        .filter(F.col("x") >= 1)
        .select(*keys, bid.alias("bid"), ub.alias("ub"))
        .groupBy(*keys, "bid")
        .agg(F.count("*").alias("cnt"), F.max("ub").alias("ub"))
    )
    return quantiles_from_buckets(bucketed, keys, percents, scale)


def quantiles_from_buckets(
    bucketed: DataFrame,
    keys: list[str],
    percents: tuple[int, ...] = (50, 95, 99),
    scale: int = 100,
) -> DataFrame:
    """Reconstruct percentiles from ``(keys…, bid, cnt, ub)`` bucket rows —
    the step a streaming consumer runs over the committed windowed histogram
    (bucket counts merge by addition, so a second-stage ``sum(cnt)`` per
    (keys, bid) upstream of this is all a re-shard needs).  Windows here run
    over ≤ ~1000 bucket rows per key, not over the data."""
    wcum = Window.partitionBy(*keys).orderBy("bid")
    wall = Window.partitionBy(*keys)
    c = bucketed.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "tot", F.sum("cnt").over(wall)
    )
    aggs = [
        F.sum("cnt").alias("n"),
        F.count("*").cast("long").alias("n_buckets"),
    ]
    for p in percents:
        thr = F.expr(f"div(tot * {p} + 99, 100)")
        aggs.append(
            (
                F.min(F.when(F.col("cum") >= thr, F.col("ub"))) / F.lit(float(scale))
            ).alias(f"p{p}")
        )
    return c.groupBy(*keys).agg(*aggs)


def hist_quantiles_sql(
    table: str,
    value_col: str,
    keys: list[str],
    percents: tuple[int, ...] = (50, 95, 99),
    scale: int = 100,
) -> str:
    """The DuckDB oracle twin — same integer bucket/rank math, unrolled."""
    ks = ", ".join(keys)
    pcols = ",\n           ".join(
        f"CAST(min(CASE WHEN cum >= (tot * {p} + 99) // 100 THEN ub END) AS BIGINT)"
        f" / {scale}.0 AS p{p}"
        for p in percents
    )
    return f"""
    WITH v AS (
      SELECT {ks}, CAST(round({value_col} * {scale}) AS BIGINT) AS x FROM {table}
      WHERE CAST(round({value_col} * {scale}) AS BIGINT) >= 1
    ),
    bb AS (
      SELECT {ks},
             CAST(length(bin(x)) * 16 + (x >> greatest(length(bin(x)) - 4, 0)) AS BIGINT) AS bid,
             CAST(CASE WHEN length(bin(x)) <= 4 THEN x
                  ELSE (((x >> (length(bin(x)) - 4)) + 1) << (length(bin(x)) - 4)) - 1
                  END AS BIGINT) AS ub
      FROM v
    ),
    g AS (SELECT {ks}, bid, max(ub) AS ub, count(*) AS cnt FROM bb GROUP BY ALL),
    c AS (
      SELECT *, sum(cnt) OVER (PARTITION BY {ks} ORDER BY bid) AS cum,
             sum(cnt) OVER (PARTITION BY {ks}) AS tot
      FROM g
    )
    SELECT {ks}, CAST(sum(cnt) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_buckets,
           {pcols}
    FROM c GROUP BY ALL ORDER BY {ks}"""

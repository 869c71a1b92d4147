"""Batch sessionization (gap-based session windows over a static table).

The streaming twin is ``F.session_window`` (pipeflow_spark.streaming.windows);
this batch version exists for (a) backfill over historical tables and (b) a
SQL-expressible oracle: lag → gap flag → cumulative sum → session id, which is
exactly how DuckDB/ANSI SQL expresses it, so the driver can verify it.

One hash shuffle on the key; the window sort is per-key local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_sec: int,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Add ``session_id`` (0-based per key): a new session starts when the gap
    since the previous event exceeds ``gap_sec``."""
    order = [F.col(ts)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(key).orderBy(*order)
    # Fractional-second gap math: timestamp → epoch seconds with microsecond
    # precision, matching SQL epoch().  unix_timestamp() truncates to whole
    # seconds and splits sessions differently on sub-second gaps.  NTZ inputs
    # route through timestamp (session tz is pinned UTC) before the cast.
    epoch = F.col(ts).cast("timestamp").cast("double")
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )


def session_stats(
    df: DataFrame,
    key: str,
    ts: str,
    gap_sec: int,
    aggs: list | None = None,
) -> DataFrame:
    """Per-session aggregate: (key, session_id, start, end, n_events, *aggs)."""
    s = sessionize(df, key, ts, gap_sec)
    base = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    return s.groupBy(key, "session_id").agg(*base, *(aggs or []))

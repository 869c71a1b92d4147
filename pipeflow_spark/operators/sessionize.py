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


def sessionize_dynamic(
    df: DataFrame,
    key: str,
    ts: str,
    gap_sec_col,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Add ``session_id`` for a PER-EVENT gap (dynamic session windows).

    Each event claims the interval ``[ts, ts + gap_sec_col)``; overlapping
    intervals within a key merge into one session — exactly Spark's
    ``F.session_window(ts, gap_column)`` semantics, which differ from
    "gap since previous event": a long-gap event can bridge later short-gap
    events that would otherwise split.  The gaps-and-islands form is a
    RUNNING MAX of interval ends, not a ``lag`` diff: a new session starts
    when ``ts >= max(prev ts + prev gap)`` (``>=`` because windows are
    half-open — touching intervals do not merge, matching the streaming
    twin pinned in ``stream_events_session_oracle``).

    Scale shape: one hash shuffle on the key; the ordered running max is a
    per-key local window, no extra exchange vs the fixed-gap version.

    ``gap_sec_col`` is a Column of seconds (int or double).  Reference
    analog: gap sessionization has no PipeFlow counterpart; this is the
    north-rule CEP surface (SURVEY.md §2.6).
    """
    order = [F.col(ts)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(key).orderBy(*order)
    epoch = F.col(ts).cast("timestamp").cast("double")
    end = epoch + gap_sec_col
    prev_max_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = F.when(prev_max_end.isNull() | (epoch >= prev_max_end), 1).otherwise(0)
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

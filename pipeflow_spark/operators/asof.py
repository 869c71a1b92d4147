"""As-of (backward) join and range join — operators Spark lacks natively.

As-of: for each left row, the most recent right row with
``right.ts <= left.ts`` per key.  Implemented as the union-tag trick — one
shuffle + one window pass, never a per-key loop:

    union(tagged left, tagged right) → window last_value(right payload)
    ignoring nulls over (key) ordered by (ts, tag) → keep left rows.

This is O(n log n/partition) with a single hash shuffle on the key — at 100 TB
it beats the naive range-join (which explodes) and matches DuckDB's native
``ASOF JOIN`` semantics (the oracle).

Range join: equi-bucketize the range key first so Catalyst gets an equi-join
to hash-partition, then post-filter the exact range — the standard
bucketed-range-join rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    tolerance_sec: int | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics; ties match unless ``strict`` — then only right.ts < left.ts).

    Returns all left columns + ``right_cols`` (null when no earlier right row
    or outside ``tolerance_sec``).
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("__r_ts"),
    )
    r = right.select(
        F.col(key),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (key, ts)],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(ts).alias("__r_ts"),
    ).select(*lcols, "__is_left", *[f"__r_{c}" for c in right_cols], "__r_ts")

    u = l.unionByName(r)
    # ties: right rows (tag 0) sort before left (tag 1) → equal-ts matches;
    # strict: left sorts first → equal-ts right rows fall outside the frame
    tag_order = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), tag_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *lcols,
        "__is_left",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}") for c in right_cols],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__f_ts"),
    ).filter(F.col("__is_left") == 1)

    if tolerance_sec is not None:
        in_tol = F.col("__f_ts").isNotNull() & (
            F.unix_timestamp(F.col(ts)) - F.unix_timestamp(F.col("__f_ts")) <= tolerance_sec
        )
        proj = [F.when(in_tol, F.col(f"__f_{c}")).alias(c2) for c, c2 in zip(right_cols, right_cols)]
    else:
        proj = [F.col(f"__f_{c}").alias(c2) for c, c2 in zip(right_cols, right_cols)]

    return filled.select(*lcols, *proj)


def asof_join_strict(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    tolerance_sec: int | None = None,
) -> DataFrame:
    """As-of with strict inequality (right.ts < left.ts) — e.g. "previous
    event", excluding the row itself in self-joins."""
    return asof_join(left, right, key, ts, right_cols, tolerance_sec, strict=True)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join ``left.left_val BETWEEN right.right_lo AND right.right_hi`` via
    bucketization: explode each right interval into the buckets it covers,
    equi-join on bucket, post-filter the exact predicate.  Turns a
    cross-product range join into a hash equi-join."""
    lb = left.withColumn("__bucket", F.floor(F.col(left_val) / bucket_width))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width),
                F.floor(F.col(right_hi) / bucket_width),
            )
        ),
    )
    out = lb.join(rb, "__bucket", how).filter(
        F.col(left_val).between(F.col(right_lo), F.col(right_hi))
    )
    return out.drop("__bucket")


def range_join_bucketed_halfopen(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Same rewrite with half-open intervals: ``lo <= val < hi``."""
    lb = left.withColumn("__bucket", F.floor(F.col(left_val) / bucket_width))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width),
                F.floor(F.col(right_hi) / bucket_width),
            )
        ),
    )
    out = lb.join(rb, "__bucket", how).filter(
        (F.col(left_val) >= F.col(right_lo)) & (F.col(left_val) < F.col(right_hi))
    )
    return out.drop("__bucket")


# -- streaming as-of (watermark-buffered per-key state machine) ---------------
#
# Spark has no native streaming as-of join (stream-stream joins are
# equi/interval, emitting ALL matches in range, not "the latest one").  The
# exact streaming form needs watermark-delayed emission: a left row is only
# safe to match once the watermark passes its event time — after that, no
# right row at-or-before it can still arrive.  State per key is therefore
# bounded by the watermark horizon (buffered rows newer than the watermark
# plus ONE collapsed right row at-or-below it), independent of stream length
# — the property that makes this viable on an unbounded 10^12-turn stream.

ASOF_STATE_SCHEMA = (
    "left_id array<long>, left_ts array<long>, "
    "right_ts array<long>, right_val array<double>, "
    "last_ts long, last_val double"
)


def asof_output_schema(key_type: str = "long") -> str:
    """Output of :func:`asof_stream_fn` (µs epoch longs; callers convert
    back with ``timestamp_micros`` — lossless, unlike ms)."""
    return f"k {key_type}, id long, ts_us long, matched_ts_us long, matched_val double"


def asof_stream_fn():
    """``applyInPandasWithState`` kernel for the streaming backward as-of.

    Input rows (per key group): ``ts_us`` (µs epoch long, JVM
    ``unix_micros`` — precomputed upstream so no pandas timezone handling),
    ``is_left`` bool, ``id`` long (left identity, null on right rows),
    ``val`` double (right payload, null on left rows).

    Every invocation buffers the new rows, then flushes all left rows whose
    event time the watermark has passed: their match is found by a numpy
    ``searchsorted`` over the buffered rights at-or-below the watermark,
    prepended with the collapsed ``last`` right (which is strictly older
    than every buffered right, keeping the array sorted).  Rights at-or-
    below the watermark then collapse to the single latest one — a future
    left is strictly newer than the watermark, so of those rights only the
    latest can ever win an as-of match.  ``EventTimeTimeout`` at
    watermark+1 guarantees a final flush on a no-data batch.
    """
    import numpy as np
    import pandas as pd

    def fn(key, pdfs, state):
        (k,) = key
        if state.exists:
            l_id, l_ts, r_ts, r_val, last_ts, last_val = state.get
            l_id, l_ts = list(l_id), list(l_ts)
            rights = list(zip(r_ts, r_val))
        else:
            l_id, l_ts, rights, last_ts, last_val = [], [], [], None, None

        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                is_l = pdf["is_left"].to_numpy(dtype=bool)
                ts = pdf["ts_us"].to_numpy(dtype="int64")
                l_id.extend(pdf["id"].to_numpy()[is_l].astype("int64").tolist())
                l_ts.extend(ts[is_l].tolist())
                rights.extend(
                    zip(ts[~is_l].tolist(), pdf["val"].to_numpy(dtype=float)[~is_l].tolist())
                )

        wm_us = state.getCurrentWatermarkMs() * 1000
        out = None
        if l_ts:
            la_ts, la_id = np.asarray(l_ts, dtype="int64"), np.asarray(l_id, dtype="int64")
            ready = la_ts <= wm_us
            if ready.any():
                base = ([] if last_ts is None else [(last_ts, last_val)]) + sorted(
                    t for t in rights if t[0] <= wm_us
                )
                bts = np.asarray([t[0] for t in base], dtype="int64")
                idx = np.searchsorted(bts, la_ts[ready], side="right") - 1
                out = pd.DataFrame(
                    {
                        "k": [k] * int(ready.sum()),
                        "id": la_id[ready],
                        "ts_us": la_ts[ready],
                        "matched_ts_us": pd.Series(
                            [int(bts[i]) if i >= 0 else None for i in idx], dtype="Int64"
                        ),
                        "matched_val": pd.Series(
                            [base[i][1] if i >= 0 else None for i in idx], dtype="float64"
                        ),
                    }
                )
                l_id = la_id[~ready].tolist()
                l_ts = la_ts[~ready].tolist()

        settled = [t for t in rights if t[0] <= wm_us]
        if settled:
            mts, mval = max(settled)
            if last_ts is None or mts > last_ts:
                last_ts, last_val = mts, mval
        rights = [t for t in rights if t[0] > wm_us]

        if out is not None and len(out):
            yield out
        if state.hasTimedOut and not l_id and not rights:
            state.remove()  # nothing pending: free the slot
        else:
            state.update(
                (
                    [int(x) for x in l_id],
                    [int(x) for x in l_ts],
                    [int(t[0]) for t in rights],
                    [float(t[1]) for t in rights],
                    last_ts,
                    last_val,
                )
            )
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)

    return fn

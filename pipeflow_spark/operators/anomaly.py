"""Per-key turn-rate spike detection — batch twin + streaming state machine.

The CEP question "is this conversation suddenly hot?" asked scalably: count
events per (key, tumbling window), compare each closed window against the
key's OWN history (all previously closed windows), flag a spike when the
current count clears an integer criterion over that history:

    spike ⇔ n_prev ≥ min_prev  AND  n · n_prev > factor · sum_prev
                               AND  n > max_prev

i.e. the window's count exceeds ``factor ×`` the key's historical mean AND
its historical max, with a warm-up of ``min_prev`` windows.  The criterion is
deliberately ALL-INTEGER (the mean comparison is cross-multiplied) so the
batch twin, the streaming state machine, and a SQL oracle agree bit-for-bit —
no float z-score drift across engines.  A z-score variant would change one
comparison; exactness is worth more here than sigma units.

Scale shape: the batch twin is one windowed count (single shuffle on
``(key, window)``) plus a window function over each key's few dozen window
rows — state per key in streaming is THREE integers (count/sum/max of closed
windows) plus the currently-open buckets, bounded by the watermark horizon,
independent of stream length.  Reference analog: the reference has no
anomaly surface; this extends its Validate/observe stage
(``PipeFlow/Pipeline.cs:96-118``) to the monitoring question its users run
downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# running stats over CLOSED windows (the key's history) + open buckets
SPIKE_STATE_SCHEMA = (
    "open_ws array<long>, open_n array<long>, "
    "n_prev long, sum_prev long, max_prev long"
)


def spike_output_schema(key_type: str = "long") -> str:
    return (
        f"k {key_type}, ws_us long, n long, "
        "n_prev long, sum_prev long, max_prev long, spike boolean"
    )


def spike_rule(n, n_prev, sum_prev, max_prev, min_prev: int = 3, factor: int = 2):
    """THE criterion, defined once — polymorphic over plain ints (the
    streaming kernel) and Columns (the batch twin): every operator is one of
    ``>=``, ``>``, ``*``, ``&``, which Column overloads and Python ints both
    support, so the two engines cannot drift apart by editing one copy."""
    return (
        (n_prev >= min_prev) & (n * n_prev > factor * sum_prev) & (n > max_prev)
    )


def turn_rate_spikes(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    min_prev: int = 3,
    factor: int = 2,
) -> DataFrame:
    """Batch twin: tumbling count per (key, window), then running
    count/sum/max over each key's PRECEDING windows via frame-bounded window
    functions.  Output: ``(ws, <key>, n, n_prev, sum_prev, max_prev, spike)``
    ordered by (ws, key)."""
    counts = df.groupBy(
        F.window(ts_col, window).alias("w"), F.col(key_col)
    ).agg(F.count("*").alias("n"))
    prev = (
        Window.partitionBy(key_col)
        .orderBy(F.col("w.start"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        counts.select(
            F.col("w.start").alias("ws"),
            key_col,
            "n",
            F.count("*").over(prev).alias("n_prev"),
            F.coalesce(F.sum("n").over(prev), F.lit(0)).alias("sum_prev"),
            F.coalesce(F.max("n").over(prev), F.lit(0)).alias("max_prev"),
        )
        .withColumn(
            "spike",
            spike_rule(
                F.col("n"), F.col("n_prev"), F.col("sum_prev"), F.col("max_prev"),
                min_prev, factor,
            ),
        )
        .orderBy("ws", key_col)
    )


def spike_stream_fn(window_us: int, min_prev: int = 3, factor: int = 2):
    """``applyInPandasWithState`` kernel (EventTimeTimeout) for the streaming
    twin.  Input rows per key group: ``ts_us`` (µs epoch long, precomputed
    JVM-side).

    Each invocation buckets new rows into open tumbling windows
    (``ws = ts - ts mod window_us``), then flushes every bucket whose END the
    watermark has passed, in window order — emitting the row BEFORE folding
    the bucket into the running (count, sum, max) history, so each window is
    judged against strictly-earlier windows, exactly like the batch twin's
    ``ROWS UNBOUNDED PRECEDING TO 1 PRECEDING`` frame.  Flush order across
    batches is free: the watermark is monotone, so an earlier window can
    never close after a later one.  Rows landing in an already-closed bucket
    (below the watermark) are dropped — the same late-data semantics as the
    native streaming window aggregate.  State per key: three longs + the
    open buckets within the watermark horizon.
    """
    import numpy as np
    import pandas as pd

    def fn(key, pdfs, state):
        (k,) = key
        if state.exists:
            open_ws, open_n, n_prev, sum_prev, max_prev = state.get
            buckets = dict(zip(open_ws, open_n))
        else:
            buckets, n_prev, sum_prev, max_prev = {}, 0, 0, 0

        wm_us = state.getCurrentWatermarkMs() * 1000

        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                ts = pdf["ts_us"].to_numpy(dtype="int64")
                for w, c in zip(*np.unique(ts - ts % window_us, return_counts=True)):
                    if int(w) + window_us <= wm_us:
                        continue  # late row for a closed window: drop
                    buckets[int(w)] = buckets.get(int(w), 0) + int(c)

        rows = []
        for ws in sorted(w for w in buckets if w + window_us <= wm_us):
            n = buckets.pop(ws)
            spike = bool(spike_rule(n, n_prev, sum_prev, max_prev, min_prev, factor))
            rows.append((k, ws, n, n_prev, sum_prev, max_prev, spike))
            n_prev += 1
            sum_prev += n
            max_prev = max(max_prev, n)

        if rows:
            yield pd.DataFrame(
                rows,
                columns=["k", "ws_us", "n", "n_prev", "sum_prev", "max_prev", "spike"],
            )

        # history is NEVER dropped — the batch twin's frame is the key's full
        # past, so an idle-key TTL would silently reset warm-up and diverge.
        # State per ever-seen key is three longs; if key cardinality itself is
        # unbounded, that is the same story as any per-key running aggregate
        # (bound it upstream, e.g. hash keys into a fixed population).
        state.update((
            list(buckets.keys()),
            list(buckets.values()),
            n_prev,
            sum_prev,
            max_prev,
        ))
        if buckets:
            # fire on the next watermark move so closable buckets flush even
            # on a batch carrying no rows for this key; idle flushed keys set
            # no timeout (nothing to close — they wake on their next row)
            state.setTimeoutTimestamp(wm_us // 1000 + 1)

    return fn

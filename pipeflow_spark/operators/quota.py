"""Per-key budget truncation (prefix quota cap) — batch twin + streaming
state machine.

"Take each source's documents, in order, until its token budget is spent" —
the corpus-mixture enforcement step of a training-data pipeline (a byte/token
quota per source, per language, per conversation).  PREFIX semantics: the
running weight is accumulated over EVERY row in key order and a row is kept
iff its inclusive running total still fits the quota — once a key's budget is
spent, everything later is cut.  (The skip-over variant — drop a too-big row
but keep trying later smaller ones — is chain-dependent and not
window-SQL-expressible; prefix truncation is, which is what makes the
streaming machine certifiable against a one-line SQL oracle.)

Batch: one frame-bounded running sum per key — a single shuffle on the key.
Streaming: rows buffer per key until the watermark passes their event time,
then flush in (event-time, id) order against a ONE-LONG running total — the
order-sensitivity is exactly why the machine must be watermark-buffered (a
row may not be judged until no earlier-ordered row can still arrive), the
same argument as the streaming as-of join (``operators/asof.py``).  State per
key: one long + the not-yet-flushed rows inside the watermark horizon.

Reference analog: the reference's ``Take`` (PipeFlow/Pipeline.cs:150-158)
truncates by global row count on one machine; this is the distributed,
per-key, weighted form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUOTA_STATE_SCHEMA = "ids array<long>, ts array<long>, ws array<long>, cum long"


def quota_output_schema(key_type: str = "string") -> str:
    return f"k {key_type}, id long, w long, cum long, kept boolean"


def budget_cap(
    df: DataFrame,
    key_col: str,
    order_col: str,
    weight_col: str,
    quota: int,
) -> DataFrame:
    """Batch twin: inclusive running sum of ``weight_col`` per key in
    ``order_col`` order (must be unique per key); ``kept = cum <= quota``.
    Output: ``(<key>, <order>, <weight>, cum, kept)``."""
    w = Window.partitionBy(key_col).orderBy(order_col)
    return (
        df.select(
            key_col,
            order_col,
            weight_col,
            F.sum(weight_col).over(w).alias("cum"),
        )
        .withColumn("kept", F.col("cum") <= quota)
        .orderBy(key_col, order_col)
    )


def quota_stream_fn(quota: int):
    """``applyInPandasWithState`` kernel (EventTimeTimeout).  Input rows per
    key group: ``id`` long (unique, ties broken by it), ``ts_us`` long,
    ``w`` long.  Buffers rows above the watermark; flushes rows at-or-below
    it in (ts, id) order against the running total — so each row is judged
    exactly once, in the same total order as the batch twin's window frame,
    regardless of arrival order or batch boundaries."""
    import pandas as pd

    def fn(key, pdfs, state):
        (k,) = key
        if state.exists:
            ids, ts, ws, cum = state.get
            ids, ts, ws = list(ids), list(ts), list(ws)
        else:
            ids, ts, ws, cum = [], [], [], 0

        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                ids.extend(pdf["id"].to_numpy(dtype="int64").tolist())
                ts.extend(pdf["ts_us"].to_numpy(dtype="int64").tolist())
                ws.extend(pdf["w"].to_numpy(dtype="int64").tolist())

        wm_us = state.getCurrentWatermarkMs() * 1000
        rows = []
        if ids:
            order = sorted(range(len(ids)), key=lambda i: (ts[i], ids[i]))
            pending = []
            for i in order:
                if ts[i] <= wm_us:
                    cum += ws[i]
                    rows.append((k, ids[i], ws[i], cum, cum <= quota))
                else:
                    pending.append(i)
            ids, ts, ws = [ids[i] for i in pending], [ts[i] for i in pending], [ws[i] for i in pending]

        if rows:
            yield pd.DataFrame(rows, columns=["k", "id", "w", "cum", "kept"])

        # like the spike machine, the running total is history — never
        # idle-TTL'd (a reset would re-open a spent budget)
        state.update((ids, ts, ws, cum))
        if ids:
            state.setTimeoutTimestamp(wm_us // 1000 + 1)

    return fn

"""Bounded-state streaming heavy hitters (Misra–Gries, sharded per window).

Reference analog: none — PipeFlow has no frequency sketch (its only stateful
construct is the RemoveDuplicates HashSet, ``PipeFlow/PipeFlow.cs:226-231``);
this is north-rule surface: top-k trending keys over an unbounded transcript/
event stream with state that does NOT grow with key cardinality.

Why not a plain windowed ``groupBy(window, key).count()``: its state is one
row per DISTINCT key per open window — at 10^12 turns with high-cardinality
keys (user ids, doc ids, error fingerprints) that is unbounded.  The
Misra–Gries (MG) summary keeps at most ``capacity`` counters per state key
and guarantees, for every key, ``stored ≤ true ≤ stored + err`` where the
tracked ``err`` is the summary's total decrement (≤ N/(capacity+1), Misra &
Gries 1982; merged summaries keep the bound — Agarwal et al., "Mergeable
Summaries", PODS 2012).  Every emitted row carries its own ``err`` so
downstream consumers see the uncertainty instead of a silently-wrong count.

Scale shape
-----------
* State keys are ``(window_start, shard)`` with ``shard =
  pmod(xxhash64(key), n_shards)`` — a hot window fans across ``n_shards``
  state-store partitions instead of serializing on one task (same posture as
  ``salted_tumbling_counts``), and each shard's summary is ≤ ``capacity``
  counters regardless of how many distinct keys the window saw.
* Emission is watermark-driven: an ``EventTimeTimeout`` set to the window end
  fires once the watermark passes it, the shard emits its summary rows and
  frees the slot — state is bounded by OPEN windows × shards × capacity.
* The cross-shard merge + top-k runs on the committed (already tiny) output:
  MG summaries merge by summing counters and summing error bounds.

Exactness mode: with ``capacity`` ≥ distinct keys per (window, shard) no
decrement ever happens, ``err = 0``, and the merged top-k equals the batch
``GROUP BY`` top-k exactly — which is how the driver oracle certifies the
whole chain (`stream_heavy_hitters_oracle`); a pytest property run with tiny
capacity pins the approximation bound itself.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HEAVY_OUTPUT_SCHEMA = "wstart timestamp, shard int, key string, cnt long, err long"
HEAVY_STATE_SCHEMA = "keys array<string>, counts array<long>, err long"


def mg_update(counter: dict[str, int], batch: dict[str, int], capacity: int) -> tuple[dict[str, int], int]:
    """Merge pre-counted ``batch`` into an MG summary of ≤ ``capacity`` keys.

    Returns ``(summary, decrement)``: the decrement (0 when the combined key
    set already fits) was subtracted from EVERY surviving counter, so each
    stored count under-estimates the true count by at most the sum of all
    decrements ever applied.  Subtracting the (capacity+1)-th largest count
    drops every key at or below it, leaving ≤ capacity survivors in one step
    (the batched form of MG's one-at-a-time decrement; same bound).
    """
    for k, v in batch.items():
        counter[k] = counter.get(k, 0) + int(v)
    if len(counter) <= capacity:
        return counter, 0
    vals = sorted(counter.values(), reverse=True)
    d = vals[capacity]  # the (capacity+1)-th largest stored count
    return {k: c - d for k, c in counter.items() if c > d}, d


def heavy_hitters_apply_fn(capacity: int, key_col: str = "key"):
    """The sketch as an ``applyInPandasWithState`` function.

    Use with ``StreamingPipeline.stateful_per_key(keys=['wstart', 'shard'],
    fn=heavy_hitters_apply_fn(c), output_schema=HEAVY_OUTPUT_SCHEMA,
    state_schema=HEAVY_STATE_SCHEMA, timeout='EventTimeTimeout')`` over rows
    carrying ``wstart`` (tumbling-window start, a timestamp column computed
    upstream, e.g. ``date_trunc('hour', ts)``), ``shard`` and ``key_col``.
    Nothing is emitted while the window is open; when the watermark passes
    the window end the state times out, the summary rows flush, and the
    slot is freed.
    """

    def fn(key, pdfs, state):
        wstart, shard = key
        if state.hasTimedOut:
            keys, counts, err = state.get
            state.remove()
            if len(keys):
                yield pd.DataFrame(
                    {
                        "wstart": [wstart] * len(keys),
                        "shard": [shard] * len(keys),
                        "key": list(keys),
                        "cnt": [int(c) for c in counts],
                        "err": [int(err)] * len(keys),
                    }
                )
            return
        if state.exists:
            keys, counts, err = state.get
            counter = dict(zip(keys, (int(c) for c in counts)))
            err = int(err)
        else:
            counter, err = {}, 0
        wend_ms = None
        for pdf in pdfs:
            if not len(pdf):  # the state machinery can deliver empty chunks
                continue
            batch = pdf[key_col].value_counts().to_dict()
            counter, d = mg_update(counter, batch, capacity)
            err += d
            wend_ms = int(pdf["wend_ms"].iloc[0])
        state.update((list(counter.keys()), list(counter.values()), err))
        if wend_ms is not None:
            # flush when the watermark passes the window end; a timeout must
            # sit strictly past the current watermark, so an already-closed
            # window fires on the very next no-data batch
            state.setTimeoutTimestamp(max(wend_ms, state.getCurrentWatermarkMs() + 1))

    return fn


def merge_heavy_hitters(committed: DataFrame, k: int, key_type: str = "string") -> DataFrame:
    """Cross-shard MG merge + deterministic top-k on the committed output.

    Counters sum, error bounds sum (mergeable-summary property); ties at the
    k boundary break by key ascending so the result is stable across engines.
    Output: ``wstart, key, cnt, err, rk`` for ``rk ≤ k``.
    """
    merged = committed.groupBy("wstart", "key").agg(
        F.sum("cnt").alias("cnt"), F.sum("err").alias("err")
    )
    w = Window.partitionBy("wstart").orderBy(F.desc("cnt"), F.col("key").cast(key_type))
    return (
        merged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("wstart", F.col("key").cast(key_type).alias("key"), "cnt", "err", "rk")
    )

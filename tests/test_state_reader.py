"""Offline state-store introspection (streaming/state_reader.py): read a
stopped query's checkpoint state without replaying the stream.

Mechanics pinned here, complementing the full value-hash SQL oracle in
`state_open_windows_oracle` (queries.py):

* `state-metadata` inventories every stateful operator with its committed
  batch range and partition count;
* after the final no-data micro-batch, an append-mode window agg's state
  holds exactly the still-open windows with their complete aggregates;
* with a watermark delay longer than the data span nothing is evicted, so
  a dedupe store holds exactly the distinct keys and a stream-stream join
  buffers exactly its input rows per side;
* the change feed decomposes into `update` puts and watermark-eviction
  `delete`s whose counts reconcile with open/closed windows;
* the skew summary's per-partition counts sum to the store's row count.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pipeflow_spark.streaming import (
    StreamingPipeline,
    TRANSCRIPT_SCHEMA,
    read_state,
    read_state_changes,
    state_metadata,
    state_skew_summary,
)

N_CONVS = 5
N_MINUTES = 60  # one turn per (conv, minute): minutes 0..59 of 2026-01-01


def _minute_rows():
    rows = []
    for m in range(N_MINUTES):
        for c in range(N_CONVS):
            rows.append(
                (
                    f"c{c}",
                    m,
                    "user" if m % 2 == 0 else "assistant",
                    f"turn {m} of c{c}",
                    None,
                    dt.datetime(2026, 1, 1, 0, m, 30),  # :30s — off window edges
                )
            )
    return rows


def _write_source(spark, tmp_path, name):
    src = str(tmp_path / name)
    spark.createDataFrame(_minute_rows(), TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(src)
    return src


def _stream(spark, src, files_per_trigger=10):
    return StreamingPipeline(
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )


def _run(sp, ckpt):
    q = (
        sp._df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


@pytest.fixture(scope="module")
def agg_ckpt(spark, tmp_path_factory):
    """Tumbling 10-min per-conv counts, 5-min watermark: after the final
    no-data batch the watermark sits at 00:59:30 − 5 min = 00:54:30, so the
    00:50–01:00 window (per conv) is the only one still open."""
    tmp = tmp_path_factory.mktemp("state_agg")
    src = _write_source(spark, tmp, "src")
    sp = (
        _stream(spark, src)
        .with_watermark("ts", "5 minutes")
        .tumbling_agg("ts", "10 minutes", ["conv_id"], F.count("*").alias("n"))
    )
    ckpt = str(tmp / "ckpt")
    _run(sp, ckpt)
    return ckpt


def test_state_metadata_inventory(spark, agg_ckpt):
    md = state_metadata(spark, agg_ckpt).collect()
    assert len(md) == 1
    row = md[0]
    assert row.operatorName == "stateStoreSave"
    assert row.numPartitions == int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert row.minBatchId == 0
    assert row.maxBatchId >= 1  # the no-data batch that advanced the watermark


def test_open_window_state_is_exact(spark, agg_ckpt):
    got = sorted(
        (r.window.start, r.conv_id, r["count"])  # r.count is Row's method
        for r in read_state(spark, agg_ckpt).collect()
    )
    open_start = dt.datetime(2026, 1, 1, 0, 50)
    expected = sorted((open_start, f"c{c}", 10) for c in range(N_CONVS))
    assert got == expected


def test_change_feed_reconciles_updates_and_evictions(spark, agg_ckpt):
    cf = read_state_changes(spark, agg_ckpt, start_batch=0)
    by_type = {r.change_type: r.n for r in cf.groupBy("change_type").agg(F.count("*").alias("n")).collect()}
    n_windows = (N_MINUTES // 10) * N_CONVS  # 6 windows x 5 convs
    n_open = N_CONVS
    # every group was put at least once; every closed window was evicted once
    assert by_type["update"] >= n_windows
    assert by_type.get("delete", 0) == n_windows - n_open
    batch_ids = [r.batch_id for r in cf.select("batch_id").distinct().collect()]
    assert min(batch_ids) == 0


def test_skew_summary_totals(spark, agg_ckpt):
    rows = state_skew_summary(spark, agg_ckpt).collect()
    assert sum(r.n_keys for r in rows) == N_CONVS
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-6
    # descending by count
    counts = [r.n_keys for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_dedupe_store_holds_distinct_keys(spark, tmp_path):
    """Watermark delay (1 hour) exceeds the 59-min data span, so no dedupe
    state expires: the store holds exactly the distinct (conv_id, turn_idx)
    keys even though the input carries each key twice."""
    src = str(tmp_path / "src")
    rows = _minute_rows()
    spark.createDataFrame(rows + rows, TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(src)
    sp = (
        _stream(spark, src)
        .with_watermark("ts", "1 hour")
        .dedupe_within_watermark(["conv_id", "turn_idx"])
    )
    ckpt = str(tmp_path / "ckpt")
    _run(sp, ckpt)
    md = state_metadata(spark, ckpt).collect()
    assert len(md) == 1 and "edupe" in md[0].operatorName  # dedupeWithinWatermark
    st = read_state(spark, ckpt, flatten=False)
    keys = sorted((r.key.conv_id, r.key.turn_idx) for r in st.collect())
    expected = sorted({(f"c{c}", m) for m in range(N_MINUTES) for c in range(N_CONVS)})
    assert keys == expected


def test_join_state_buffers_each_side(spark, tmp_path):
    """Stream-stream reply join with an unexpired watermark: each side's
    buffered state is its full input, readable per side via joinSide."""
    src = _write_source(spark, tmp_path, "src")
    users = _stream(spark, src).filter(F.col("role") == "user").with_watermark("ts", "1 hour")
    replies = (
        _stream(spark, src).filter(F.col("role") == "assistant").with_watermark("ts", "1 hour")
    )
    sp = users.join_replies(replies, max_reply_delay="10 minutes")
    ckpt = str(tmp_path / "ckpt")
    _run(sp, ckpt)
    ops = state_metadata(spark, ckpt)
    assert any("oin" in r.operatorName for r in ops.collect())  # symmetricHashJoin
    n_user = N_CONVS * ((N_MINUTES + 1) // 2)
    n_asst = N_CONVS * (N_MINUTES // 2)
    left = read_state(spark, ckpt, join_side="left", flatten=False)
    right = read_state(spark, ckpt, join_side="right", flatten=False)
    assert left.count() == n_user
    assert right.count() == n_asst


def test_read_state_rejects_bad_join_side(spark, agg_ckpt):
    with pytest.raises(ValueError, match="join_side"):
        read_state(spark, agg_ckpt, join_side="both")

"""The flagship streaming narrative as user-facing documentation: the
reference's composable ETL chain (read → Filter → Transform → Batch → Write
with dedupe + validation stages, ``PipeFlow/PipeFlow.cs:25-191`` surface) run
as a Structured Streaming micro-batch CEP pipeline over conversation
transcripts — the engine's north-star shape.

Chain: transcript file stream → Arrow-vectorized profile transform →
watermark → stateful within-watermark dedupe on (conv_id, turn_idx) →
validation split (valid rows to the main sink, failures + failed-rule
messages to a dead-letter sink, same batch id) — both sinks exactly-once
ledgered, so kill/replay is a no-op.  At cluster scale the same chain reads
Kafka or Iceberg incremental scans; the file source keeps this runnable
offline and replayable.

Run:  python examples/streaming_training_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pipeflow_spark import Validator, get_spark
from pipeflow_spark.streaming.engine import StreamingPipeline, await_drained
from pipeflow_spark.streaming.exactly_once import ExactlyOnceSink

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def run(spark=None, workdir: str | None = None) -> dict:
    own_session = spark is None
    if own_session:
        spark = get_spark("streaming_example", cpus=8, shuffle_partitions=8)
    tmp = workdir or tempfile.mkdtemp(prefix="pipeflow_stream_example_")

    # stage deterministic transcript turns as arrival-ordered files (a
    # replayable stand-in for the Kafka/Iceberg feed) — same synthesizer the
    # streaming test-suite and bench use
    from pipeflow_spark.streaming.transcripts import (
        synthesize_transcripts,
        write_arrival_files,
    )

    stage = os.path.join(tmp, "incoming")
    pdf = synthesize_transcripts(n_convs=60, n_files=4, seed=42, late_frac=0.1)
    write_arrival_files(pdf, stage)
    # a few malformed turns (empty text) so the dead-letter path is visible
    spark.createDataFrame(
        [("conv_bad", i, "user", "", None, pdf.ts.max().to_pydatetime()) for i in range(3)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(stage)

    validator = (
        Validator()
        .column("conv_id").required()
        .column("turn_idx").required().range(0, 10_000)
        .column("text").required().min_length(1)
        .and_
    )

    main_sink = ExactlyOnceSink(os.path.join(tmp, "sink_main"))
    dlq_sink = ExactlyOnceSink(os.path.join(tmp, "sink_dlq"))

    q = (
        StreamingPipeline.read_transcripts(spark, stage, max_files_per_trigger=2)
        # Transform stage — Arrow-vectorized, never per-row Python
        .add_column("n_tokens", F.size(F.split(F.col("text"), r"\s+")))
        # watermark bounds all downstream state; late turns beyond it drop
        .with_watermark("ts", "10 minutes")
        # the reference's RemoveDuplicates as bounded-state streaming dedupe
        .dedupe_within_watermark(["conv_id", "turn_idx"])
        # Validate stage: one upstream plan, valid/failed split per batch id
        .start_validated(
            main_sink, dlq_sink, validator, os.path.join(tmp, "ckpt"),
        )
    )
    await_drained(q)
    q.stop()

    out = spark.read.parquet(os.path.join(main_sink.data_dir, "*"))
    n_main = out.count()
    dlq_files = os.listdir(dlq_sink.data_dir) if os.path.exists(dlq_sink.data_dir) else []
    n_dlq = (
        spark.read.parquet(os.path.join(dlq_sink.data_dir, "*")).count() if dlq_files else 0
    )
    print(
        f"main sink: {n_main} turns across {len(main_sink.committed_batches())} "
        f"exactly-once batches; dead-letter: {n_dlq}"
    )
    if own_session:
        spark.stop()
    return {"main_rows": n_main, "dlq_rows": n_dlq, "batches": len(main_sink.committed_batches())}


if __name__ == "__main__":
    print(run())

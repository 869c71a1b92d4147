"""Python DataSource generators (pipeflow_spark/gensource.py).

The load-bearing property is PURITY: every row is a counter-based hash of
(seed, conv, turn), so partitioning, batch boundaries, retries, and cluster
size cannot change content.  Tests pin that directly — same data under
different partition counts, stream ≡ batch, and checkpoint-resume with no
duplicates through the exactly-once sink.
"""

import os

import pytest
from pyspark.sql import functions as F

from pipeflow_spark.gensource import conv_sizes, register_python_sources
from pipeflow_spark.streaming import ExactlyOnceSink, TRANSCRIPT_SCHEMA
from pipeflow_spark.streaming.engine import StreamingPipeline


@pytest.fixture(scope="module")
def gen(spark):
    register_python_sources(spark)
    return spark


def _read_gen(spark, n_convs, partitions, **opts):
    r = spark.read.format("pipeflow.transcripts").option("n_convs", n_convs).option(
        "partitions", partitions
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _rows(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
        for r in df.collect()
    )


def test_batch_gen_schema_and_shape(gen):
    df = _read_gen(gen, 300, 4)
    # same names and types as the file-backed transcript schema (data-source
    # columns are nullable by API contract, so nullability is not compared)
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in TRANSCRIPT_SCHEMA.fields
    ]
    n = df.count()
    assert n == int(conv_sizes(42, 0, 300).sum())
    assert df.select("conv_id").distinct().count() == 300
    # roles follow turn mod 3; tool set only on tool turns
    bad = df.filter(
        ((F.col("turn_idx") % 3 == 0) & (F.col("role") != "user"))
        | ((F.col("role") == "tool") == F.col("tool").isNull())
    )
    assert bad.count() == 0


def test_batch_gen_partition_invariance(gen):
    """Same table at 1, 3, and 8 partitions — partitioning is physical only."""
    base = _rows(_read_gen(gen, 200, 1))
    assert base == _rows(_read_gen(gen, 200, 3))
    assert base == _rows(_read_gen(gen, 200, 8))
    assert len(base) > 600  # avg ~4+ turns/conv: the zipf tail actually fired


def test_batch_gen_partitions_honored_and_executor_side(gen):
    df = _read_gen(gen, 1000, 8)
    assert df.rdd.getNumPartitions() == 8
    # the scan is a Python data-source batch scan — generation happens in the
    # scan itself (executor-side), not via a driver createDataFrame
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan pipeflow.transcripts" in plan


def test_batch_gen_seed_changes_data(gen):
    a = _read_gen(gen, 100, 2).agg(F.sum("turn_idx")).first()[0]
    b = _read_gen(gen, 100, 2, seed=7).agg(F.sum("turn_idx")).first()[0]
    assert a != b


def test_batch_gen_filter_pushdown(gen):
    """With spark.sql.python.filterPushdown.enabled, role equality/membership
    and turn_idx bounds are CONSUMED by the generator (role is turn mod 3 —
    a residue mask; turn bounds clamp the per-conv ranges before any row
    materializes).  Results must equal post-hoc filtering of the full table,
    and the residual plan Filter must not contain the consumed predicates."""
    prev = gen.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    gen.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        base = _read_gen(gen, 300, 4)
        full = base.collect()
        flt = base.filter(
            (F.col("role").isin("user", "tool"))
            & (F.col("turn_idx") < 9)
            & (F.col("turn_idx") > 2)
        )
        got = sorted((r.conv_id, r.turn_idx, r.role) for r in flt.collect())
        want = sorted(
            (r.conv_id, r.turn_idx, r.role)
            for r in full
            if r.role in ("user", "tool") and 2 < r.turn_idx < 9
        )
        assert got == want and len(got) > 0
        plan = flt._jdf.queryExecution().executedPlan().toString()
        post_filters = [l for l in plan.splitlines() if "Filter " in l]
        assert all("= user" not in l and "< 9" not in l for l in post_filters), post_filters
        # consumed-but-unsatisfiable predicates generate nothing (and fast)
        assert base.filter(F.col("role") == "nonexistent").count() == 0
        assert base.filter(F.col("turn_idx") < 0).count() == 0
    finally:
        gen.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def test_stream_gen_equals_batch_and_resumes(gen, tmp_path):
    """Bounded stream through the exactly-once sink == batch generator read,
    across a mid-stream stop/restart from checkpoint (offsets dominate the
    fresh reader's admission counter, so no range is re-admitted)."""
    n_convs, cpb = 600, 150
    sink = ExactlyOnceSink(str(tmp_path / "sink"))
    ckpt = str(tmp_path / "ckpt")

    def start():
        df = (
            gen.readStream.format("pipeflow.transcripts_stream")
            .option("n_convs", n_convs)
            .option("convs_per_batch", cpb)
            .option("partitions", 4)
            .option("progress_path", str(tmp_path / "progress"))
            .load()
        )
        return (
            StreamingPipeline(df)
            .start_exactly_once(sink, ckpt, available_now=False, query_name="gen_stream")
        )

    q = start()
    # let at least one batch commit, then kill mid-run
    import time

    for _ in range(200):
        if sink.committed_batches():
            break
        time.sleep(0.1)
    q.stop()
    q.awaitTermination()

    q = start()
    # bounded source: once the offset reaches n_convs nothing new arrives
    for _ in range(400):
        got = sink.read_committed(gen).count()
        if got >= 0 and max(sink.committed_batches(), default=-1) >= 0:
            # stop when the full conv range has been committed
            n_expected = int(conv_sizes(42, 0, n_convs).sum())
            if got == n_expected:
                break
        time.sleep(0.25)
    q.stop()
    q.awaitTermination()

    out = sink.read_committed(gen)
    batch = _read_gen(gen, n_convs, 4)
    assert out.count() == batch.count()  # no dupes, no loss across restart
    assert _rows(out.select(*[f.name for f in TRANSCRIPT_SCHEMA.fields])) == _rows(batch)


def test_stream_gen_clean_restart_no_duplicates(gen, tmp_path):
    """The offset-regression bug class: a CLEAN restart (checkpoint at a
    committed boundary) with a fresh reader must not re-admit committed
    conversations.  With progress_path the counter resumes at-or-above the
    checkpoint immediately; without it the engine (verified: Spark 4.1
    plans no batch whose end is behind the checkpoint) idles until the
    fresh counter catches up, then continues — both paths proven
    duplicate-free by growing the bounded range across restarts."""
    import time

    from pipeflow_spark.gensource import conv_sizes

    sink = ExactlyOnceSink(str(tmp_path / "sink_cr"))
    ckpt = str(tmp_path / "ckpt_cr")

    def start(n_convs, progress=True):
        r = (
            gen.readStream.format("pipeflow.transcripts_stream")
            .option("n_convs", n_convs)
            .option("convs_per_batch", 100)
            .option("partitions", 2)
        )
        if progress:
            r = r.option("progress_path", str(tmp_path / "progress_cr"))
        return StreamingPipeline(r.load()).start_exactly_once(
            sink, ckpt, available_now=False, query_name="gen_cr"
        )

    def drain(q, n_expected):
        for _ in range(400):
            if (
                sink.committed_batches()
                and sink.read_committed(gen).count() == n_expected
            ):
                break
            time.sleep(0.25)
        q.stop()
        q.awaitTermination()

    n1 = int(conv_sizes(42, 0, 300).sum())
    q = start(300)
    drain(q, n1)  # runs to the bounded end: checkpoint at a clean boundary
    assert sink.read_committed(gen).count() == n1

    # restart with a larger bound: fresh reader, counter restored from the
    # progress file — only convs 300..600 are admitted, no re-generation
    n2 = int(conv_sizes(42, 0, 600).sum())
    q = start(600)
    drain(q, n2)
    out = sink.read_committed(gen)
    assert out.count() == n2
    dupes = out.groupBy("conv_id", "turn_idx").count().filter(F.col("count") > 1)
    assert dupes.count() == 0

    # without progress_path, the same clean restart self-heals: the engine
    # plans no regressed batch while the fresh counter idles back up, then
    # resumes from the checkpoint — still zero duplicates
    sink2 = ExactlyOnceSink(str(tmp_path / "sink_cr2"))
    r = (
        gen.readStream.format("pipeflow.transcripts_stream")
        .option("n_convs", 300)
        .option("convs_per_batch", 100)
        .option("partitions", 2)
    )
    q = StreamingPipeline(r.load()).start_exactly_once(
        sink2, str(tmp_path / "ckpt_cr2"), available_now=False, query_name="gen_cr2"
    )
    n1b = int(conv_sizes(42, 0, 300).sum())
    for _ in range(400):
        if sink2.committed_batches() and sink2.read_committed(gen).count() == n1b:
            break
        time.sleep(0.25)
    q.stop()
    q.awaitTermination()
    r2 = (
        gen.readStream.format("pipeflow.transcripts_stream")
        .option("n_convs", 600)
        .option("convs_per_batch", 100)
        .option("partitions", 2)
    )
    q = StreamingPipeline(r2.load()).start_exactly_once(
        sink2, str(tmp_path / "ckpt_cr2"), available_now=False, query_name="gen_cr2b"
    )
    for _ in range(400):
        if sink2.read_committed(gen).count() == n2:
            break
        time.sleep(0.25)
    q.stop()
    q.awaitTermination()
    out2 = sink2.read_committed(gen)
    assert out2.count() == n2
    assert (
        out2.groupBy("conv_id", "turn_idx").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_stream_gen_late_arrivals(gen, tmp_path):
    """late_frac delays a pure-hash subset of turns by late_delay_convs due
    positions: the stream is genuinely out of event-time order (what a
    watermark engine must be fed), rows partition exactly between on-time
    and late halves (union ≡ the batch table, no dupes, no loss), and the
    late rows arrive in strictly later batches than their home convs."""
    import time

    from pipeflow_spark.gensource import conv_sizes

    n_convs, cpb, delay = 600, 150, 300
    sink = ExactlyOnceSink(str(tmp_path / "sink_late"))
    df = (
        gen.readStream.format("pipeflow.transcripts_stream")
        .option("n_convs", n_convs)
        .option("convs_per_batch", cpb)
        .option("partitions", 4)
        .option("late_frac", 0.3)
        .option("late_delay_convs", delay)
        .load()
    )
    q = StreamingPipeline(df).start_exactly_once(
        sink, str(tmp_path / "ckpt_late"), available_now=False, query_name="gen_late"
    )
    n_expected = int(conv_sizes(42, 0, n_convs).sum())
    try:
        for _ in range(400):
            if sink.committed_batches() and sink.read_committed(gen).count() == n_expected:
                break
            time.sleep(0.25)
    finally:
        q.stop()
        q.awaitTermination()

    out = sink.read_committed(gen)
    assert out.count() == n_expected  # exact partition: no dupes, no loss
    assert _rows(out.select(*[f.name for f in out.schema.fields if f.name != "_batch_id"])) == _rows(
        _read_gen(gen, n_convs, 4)
    )
    # disorder is real: some batch contains a row older than an earlier
    # batch's maximum event time
    per_batch = {
        r._batch_id: (r.mn, r.mx)
        for r in out.groupBy("_batch_id").agg(
            F.min("ts").alias("mn"), F.max("ts").alias("mx")
        ).collect()
    }
    bs = sorted(per_batch)
    assert any(
        per_batch[b][0] < max(per_batch[a][1] for a in bs if a < b)
        for b in bs[1:]
    )
    # and the lateness is structural, not just overlapping conv starts: rows
    # exist whose conversation is OLDER than their batch's due range (the
    # delayed half), including in the extension batches past n_convs
    conv_idx = F.regexp_extract("conv_id", r"(\d+)", 1).cast("long")
    displaced = out.withColumn("ci", conv_idx).filter(
        F.col("ci") < F.col("_batch_id") * cpb
    )
    assert displaced.count() > 0
    tail = out.filter(F.col("_batch_id") >= n_convs // cpb)
    assert tail.count() > 0  # the extension horizon carried the last late rows


def test_stream_gen_rate_control(gen, tmp_path):
    """convs_per_batch bounds admission: with 100 convs/batch over 300 convs,
    at least 3 distinct micro-batches carry data."""
    sink = ExactlyOnceSink(str(tmp_path / "sink_rate"))
    df = (
        gen.readStream.format("pipeflow.transcripts_stream")
        .option("n_convs", 300)
        .option("convs_per_batch", 100)
        .option("partitions", 2)
        .load()
    )
    q = StreamingPipeline(df).start_exactly_once(
        sink, str(tmp_path / "ckpt_rate"), available_now=False, query_name="gen_rate"
    )
    import time

    n_expected = int(conv_sizes(42, 0, 300).sum())
    try:
        for _ in range(400):
            if sink.committed_batches() and sink.read_committed(gen).count() == n_expected:
                break
            time.sleep(0.25)
    finally:
        q.stop()
        q.awaitTermination()
    out = sink.read_committed(gen)
    assert out.count() == n_expected
    data_batches = (
        out.select("_batch_id").distinct().count()
    )
    assert data_batches >= 3
    # per-batch conv ranges are disjoint: no conv spans two micro-batches
    spans = (
        out.groupBy("conv_id").agg(F.countDistinct("_batch_id").alias("nb"))
        .filter(F.col("nb") > 1)
    )
    assert spans.count() == 0

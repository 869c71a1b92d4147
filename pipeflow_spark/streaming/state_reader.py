"""Offline state-store introspection — read a streaming checkpoint's state
as DataFrames (Spark's ``statestore`` / ``state-metadata`` v2 sources).

Why this exists (north rule: "resumable from checkpoint with per-partition
lineage + metrics"): at 10^12-turn scale the stateful operators — window
aggregates, dedupe key sets, join buffers, CEP automata — hold the only
authoritative answer to "which conversations are open right now, and where
does the state actually live?".  ``state_metrics`` (engine.py) reports
*aggregate* per-batch numbers from ``StreamingQueryProgress``; this module
reads the *contents*: every key/value row in every state store of a stopped
(or checkpointed-and-running) query, without replaying the stream.

Typical production uses, all offline and read-only:

* audit watermark eviction — which windows/sessions are still open after a
  run, and exactly what partial aggregates they hold;
* state-skew triage — per-``partition_id`` row counts reveal a hot
  conversation pinning one RocksDB store (pair with the skew salting in
  ``engine.salted_tumbling_counts``);
* exactly-once debugging — the change feed (``readChangeFeed``) shows each
  micro-batch's state puts/deletes, so a replayed batch can be proven a
  no-op at the state layer too;
* safe state surgery planning before a checkpoint migration.

No reference analog (the reference's streaming is a stateless async CSV read,
``PipeFlow/CsvReaderAsync.cs:71-124``); this is native Spark 4 surface.

Scale posture: the sources scan the checkpoint's state files directly with
one input partition per state-store partition — cost is proportional to
state size, never to stream history; no shuffle is introduced by the readers
themselves (``state_skew_summary`` adds the one hash shuffle its groupBy
needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "state_metadata",
    "read_state",
    "read_state_changes",
    "state_skew_summary",
]


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Inventory of every stateful operator in a checkpoint: ``operatorId``,
    ``operatorName`` (e.g. ``stateStoreSave``, ``dedupeWithinWatermark``,
    ``symmetricHashJoin``), ``stateStoreName``, ``numPartitions``, and the
    committed ``minBatchId``/``maxBatchId`` range — the map you consult
    before pointing :func:`read_state` at a multi-operator query."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int | None = None,
    store_name: str | None = None,
    batch_id: int | None = None,
    join_side: str | None = None,
    flatten: bool = True,
) -> DataFrame:
    """State-store contents as of ``batch_id`` (default: last committed).

    ``operator_id`` selects among chained stateful operators (see
    :func:`state_metadata`); ``join_side`` (``"left"``/``"right"``) reads a
    stream-stream join's buffered rows without naming its four internal
    stores; ``store_name`` addresses one store directly when needed.

    With ``flatten=True`` (default) the raw ``key``/``value`` structs are
    exploded into top-level columns (``key.*`` then ``value.*`` — window
    structs stay as structs) plus ``partition_id``; field-name collisions
    between key and value raise in Spark's analyzer, in which case pass
    ``flatten=False`` and project manually.
    """
    r = spark.read.format("statestore")
    if operator_id is not None:
        r = r.option("operatorId", operator_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if join_side is not None:
        if join_side not in ("left", "right"):
            raise ValueError(f"join_side must be 'left' or 'right', got {join_side!r}")
        r = r.option("joinSide", join_side)
    df = r.load(checkpoint)
    if flatten:
        df = df.select("key.*", "value.*", "partition_id")
    return df


def read_state_changes(
    spark: SparkSession,
    checkpoint: str,
    start_batch: int = 0,
    end_batch: int | None = None,
    operator_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """Per-micro-batch state change feed over ``[start_batch, end_batch]``:
    ``batch_id``, ``change_type`` (``update``/``delete``), raw ``key`` /
    ``value`` structs, ``partition_id``.  ``delete`` rows are watermark
    evictions — the offline audit trail for "late turns were dropped and
    their state reclaimed"."""
    r = (
        spark.read.format("statestore")
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", start_batch)
    )
    if end_batch is not None:
        r = r.option("changeEndBatchId", end_batch)
    if operator_id is not None:
        r = r.option("operatorId", operator_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    return r.load(checkpoint)


def state_skew_summary(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """Per-state-partition row counts (``partition_id``, ``n_keys``) plus the
    share of the largest partition — the one-look skew gauge: a hot
    ``conv_id`` at 10^12-turn scale shows up here as one partition holding a
    disproportionate key count long before it shows up as a straggler
    task."""
    raw = read_state(
        spark, checkpoint, operator_id=operator_id, store_name=store_name, flatten=False
    )
    per = raw.groupBy("partition_id").agg(F.count("*").alias("n_keys"))
    total = F.sum("n_keys").over(Window.partitionBy())
    return per.select(
        "partition_id",
        "n_keys",
        F.round(F.col("n_keys") / total, 4).alias("share"),
    ).orderBy(F.desc("n_keys"), "partition_id")

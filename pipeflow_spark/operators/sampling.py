"""Deterministic sampling, split, mixture, and sequence-packing operators for
training-data pipelines.

Everything here is **hash-deterministic**: the same row always lands in the
same split/bucket regardless of cluster size, partitioning, or run count —
the property a reproducible 100 TB data pipeline needs (Spark's
``sample``/``sampleBy`` are seed-deterministic only under a fixed partition
layout, which a growing corpus never keeps).  The bucket function is
``md5`` (bit-identical in DuckDB), so every operator has an exact SQL twin.

Scale notes:

* split/mixture are map-only filters — no shuffle, pipelined into the scan;
* :func:`pack_sequences` is the GPT-style concatenate-and-chunk packing:
  a *global* running sum would serialize on one sort, so packing runs per
  deterministic shard (``id % shards``) — each shard's window sort is
  independent and parallel, sequence ids are unique per (shard, seq).

Reference analog: PipeFlow has no sampling surface; nearest is ``Filter``
(``PipeFlow/Pipeline.cs:60-64``).  Training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 100


def hash_bucket(col: Column, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in ``[0, buckets)``: first 8 hex chars of
    ``md5(string(col))`` mod buckets.  Pure Column algebra; identical to
    DuckDB's ``('0x' || substr(md5(col::VARCHAR), 1, 8))::BIGINT % buckets``."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
    return h % buckets


def hash_bucket_sql(expr: str, buckets: int = BUCKETS) -> str:
    """The DuckDB twin of :func:`hash_bucket`, as a SQL fragment."""
    return f"(('0x' || substr(md5(({expr})::VARCHAR), 1, 8))::BIGINT % {buckets})"


def add_split(
    df: DataFrame, id_col: str = "doc_id", val_pct: int = 10, test_pct: int = 0
) -> DataFrame:
    """Reproducible train/val(/test) split by id hash: bucket < val_pct →
    ``val``, next ``test_pct`` buckets → ``test``, rest → ``train``."""
    b = hash_bucket(F.col(id_col))
    split = (
        F.when(b < val_pct, F.lit("val"))
        .when(b < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def mixture_filter(
    df: DataFrame, source_col: str, rates: dict[str, float], id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic source-mixture downsampling: keep a row iff
    ``hash_bucket(id) < rate[source] * 100``.  Unlisted sources are dropped
    (rate 0).  Map-only; the mixture is stable under reruns and re-partitioning
    so downstream epochs see the same corpus."""
    b = hash_bucket(F.col(id_col))
    rate = F.lit(0.0)
    for src, r in rates.items():
        rate = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(rate)
    return df.filter(b < rate * BUCKETS)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    shards: int = 32,
) -> DataFrame:
    """Concatenate-and-chunk sequence packing: documents are laid out in a
    deterministic order (shard = ``id % shards``, then id), and each doc is
    assigned the training sequence (``seq_id``) and intra-sequence
    ``offset`` where its first token lands, for a fixed ``budget`` tokens
    per packed sequence.  Docs straddling a boundary continue into the next
    sequence — exactly GPT-style packing where documents are split across
    training windows.

    Two-level parallelism: the window sort runs per shard (no global sort);
    ``seq_id`` is globally unique via ``shard * ceil(shard_tokens/budget)``
    name-spacing — here simply ``(shard, seq_in_shard)`` kept as columns.

    Sharding is type-aware: numeric ids take ``pmod(id, shards)`` (cheap,
    oracle-friendly); string ids take ``pmod(xxhash64(id), shards)`` — a
    plain ``%`` on a string casts to NULL row-by-row, silently collapsing
    the whole corpus into one NULL shard (a serialized sort AND wrong
    layout).  Any other id type raises at build time.
    """
    id_type = dict(df.dtypes).get(id_col)
    if id_type in ("string",):
        shard = F.pmod(F.xxhash64(id_col), F.lit(shards)).cast("int")
    elif id_type in ("tinyint", "smallint", "int", "bigint"):
        shard = F.pmod(F.col(id_col), F.lit(shards)).cast("int")
    else:
        raise TypeError(
            f"pack_sequences id column {id_col!r} has type {id_type!r}; "
            "need an integer or string id to shard deterministically"
        )
    w = Window.partitionBy("shard").orderBy(id_col)
    cum_excl = F.sum(token_col).over(w) - F.col(token_col)
    return (
        df.withColumn("shard", shard)
        .withColumn("start_tok", cum_excl.cast("bigint"))
        .withColumn("seq_in_shard", (F.col("start_tok") / budget).cast("bigint"))
        .withColumn("offset", (F.col("start_tok") % budget).cast("bigint"))
    )

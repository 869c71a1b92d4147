"""Sink surface — PipeFlow's writer vocabulary, distributed.

Reference analogs (all single-process, first-row-schema writers):

* ``ToCsv`` — ``PipeFlow/CsvWriter.cs:56-147``: canonical formats
  ``DateTime -> "yyyy-MM-dd HH:mm:ss"``, ``bool -> lowercase``; append mode.
* ``ToJson`` — ``PipeFlow/Json/JsonWriter.cs:47-75``: whole-array document
  (we write distributed JSONL; the array-document shape is a driver-side
  convenience for small results only).
* ``ToSql/ToPostgreSql`` batched INSERT / ``ON CONFLICT`` upsert —
  ``PipeFlow/Sql/SqlWriter.cs:160-194``, ``PostgreSQL/PostgreSqlWriter.cs:220-247``:
  re-expressed as :func:`upsert_parquet` — a keyed MERGE into a parquet-backed
  table with an atomic snapshot swap.  On a real deployment this is Iceberg
  ``MERGE INTO`` and the swap is a snapshot commit; the interface is identical
  (SURVEY.md §7.0 — no Iceberg jar in this sandbox).

Scale notes: every writer here is a distributed ``df.write`` (per-partition
parallel files, no driver materialization).  ``upsert_parquet`` reads the
current table once, anti-joins on the keys (broadcast when the incoming side
is small) and rewrites — O(table) per merge like any copy-on-write format;
at 100 TB you partition the table and merge only touched partitions
(``partition_by`` + dynamic partition overwrite does exactly that).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CANON_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def canonicalize(df: DataFrame) -> DataFrame:
    """Apply the reference's canonical CSV cell formats (CsvWriter.cs:135-147):
    timestamps as ``yyyy-MM-dd HH:mm:ss``, booleans lowercase."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.TimestampType):
            cols.append(F.date_format(c, CANON_TS_FMT).alias(f.name))
        elif isinstance(f.dataType, T.BooleanType):
            cols.append(F.lower(c.cast("string")).alias(f.name))
        else:
            cols.append(c)
    return df.select(*cols)


class write:  # noqa: N801 — fluent exit, mirrors reference `.ToCsv/.ToJson/...`
    @staticmethod
    def csv(df: DataFrame, path: str, mode: str = "overwrite", delimiter: str = ",", header: bool = True) -> None:
        """``ToCsv`` (PipeFlow.cs:315-332) with canonical formats; ``mode=
        "append"`` is the reference's append flag (CsvWriter.cs:50-54)."""
        (
            canonicalize(df)
            .write.mode(mode)
            .options(header=header, sep=delimiter, quote='"', escape='"')
            .csv(path)
        )

    @staticmethod
    def json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
        """``ToJson`` (PipeFlow.cs:334-351) as distributed JSONL."""
        df.write.mode(mode).json(path)

    @staticmethod
    def parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: Sequence[str] = ()) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)


def upsert_parquet(
    spark: SparkSession,
    incoming: DataFrame,
    table_path: str,
    keys: Sequence[str],
    do_update: bool = True,
) -> None:
    """Keyed MERGE into a parquet table with atomic snapshot swap.

    ``do_update=True`` = ``ON CONFLICT DO UPDATE`` (incoming wins —
    PostgreSqlWriter.cs:228-244); ``False`` = ``ON CONFLICT DO NOTHING``
    (existing wins — PostgreSqlWriter.cs:222-226).  Equivalent to Iceberg
    ``MERGE INTO t USING s ON keys WHEN MATCHED THEN UPDATE WHEN NOT MATCHED
    THEN INSERT``.

    Atomicity: write the merged table to a staging dir, then swap via rename —
    readers see old or new snapshot, never a mix (the parquet stand-in for an
    Iceberg snapshot commit).
    """
    keys = list(keys)
    if os.path.exists(table_path):
        current = spark.read.parquet(table_path)
        if do_update:
            keep = current.join(incoming.select(*keys).distinct(), keys, "left_anti")
            merged = keep.unionByName(incoming)
        else:
            add = incoming.join(current.select(*keys).distinct(), keys, "left_anti")
            merged = current.unionByName(add)
    else:
        merged = incoming.dropDuplicates(keys) if not do_update else incoming

    parent = os.path.dirname(os.path.abspath(table_path)) or "."
    staging = os.path.join(parent, f".staging-{uuid.uuid4().hex}")
    merged.write.mode("overwrite").parquet(staging)
    old = os.path.join(parent, f".old-{uuid.uuid4().hex}")
    if os.path.exists(table_path):
        os.rename(table_path, old)
    os.rename(staging, table_path)
    shutil.rmtree(old, ignore_errors=True)


def collect_json_document(df: DataFrame, path: str, order_by: Sequence[str] = ()) -> None:
    """The reference's whole-array JSON *document* shape (JsonWriter.cs:47-75)
    — driver-side, for small results only (it materializes)."""
    import json as _json

    if order_by:
        df = df.orderBy(*order_by)
    rows = [r.asDict(recursive=True) for r in df.collect()]
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        _json.dump(rows, f, indent=2, default=str)
    os.rename(tmp, path)


__all__ = ["CANON_TS_FMT", "canonicalize", "collect_json_document", "upsert_parquet", "write"]

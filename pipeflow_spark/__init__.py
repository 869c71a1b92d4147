"""pipeflow_spark — a PySpark-native streaming/CEP analytics engine.

Re-expresses the capabilities of the reference ETL library (Nonanti/PipeFlow,
surveyed in SURVEY.md) as an idiomatic Spark engine: DataFrame/SQL logical
plans optimized by Catalyst, Arrow-vectorized pandas UDF stages for arbitrary
transforms, Structured Streaming micro-batch CEP over transcript tables with
watermarks / windows / stateful joins, and an exactly-once idempotent sink.
"""

from pyspark.sql import functions as F

from .catalog import TableCatalog
from .datarow import DataRow
from .gensource import register_python_sources
from .pipeline import Pipeline, PipelineResult
from .session import get_spark, load_table
from .validation import ValidationError, ValidationStrategy, Validator

__all__ = [
    "DataRow",
    "Pipeline",
    "PipelineResult",
    "TableCatalog",
    "ValidationError",
    "ValidationStrategy",
    "Validator",
    "get_spark",
    "load_table",
    "read",
    "register_python_sources",
]

__version__ = "0.1.0"


class read:  # noqa: N801 — fluent entry, mirrors reference `PipeFlow.From`
    """Source bind: ``read.parquet(spark, path)`` → :class:`Pipeline`.

    Reference analog: ``PipeFlow.From.Csv/Json/...`` (``PipeFlow/PipeFlow.cs:25-191``).
    """

    @staticmethod
    def parquet(spark, path: str) -> Pipeline:
        return Pipeline(spark.read.parquet(path))

    @staticmethod
    def csv(spark, path: str, schema=None, **options) -> Pipeline:
        opts = {"header": True, "multiLine": True, "escape": '"', **options}
        reader = spark.read.options(**opts)
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", True)
        return Pipeline(reader.csv(path))

    @staticmethod
    def csv_quarantine(
        spark, path: str, schema, quarantine_dir: str, **options
    ) -> Pipeline:
        """CSV read with a malformed-row QUARANTINE — the batch twin of the
        streaming dead-letter split (``StreamingPipeline.start_validated``):
        rows that fail to parse against ``schema`` are written verbatim to
        ``quarantine_dir`` (one ``raw`` string column) for replay/repair,
        and the returned Pipeline carries only clean rows.  PipeFlow's
        reader silently coerces or nulls bad cells (``CsvReader.cs:208-234``
        ConvertValue); at corpus scale silent nulls are data loss — a
        quarantine keeps ingestion lossless and auditable.

        Implementation: PERMISSIVE parse with ``columnNameOfCorruptRecord``;
        the corrupt column must be SELECTED before filtering (Spark refuses
        a filter-only reference to it).  The quarantine write and the
        returned clean plan each scan the file once (two passes total) —
        deliberately NOT ``cache()``d: the returned Pipeline is lazy, so a
        cache could never be safely unpersisted and would pin every
        quarantined file's parsed contents in executor storage for the
        session.  ``schema`` is required: corrupt-record capture needs
        explicit types (inference would just downgrade everything to string
        and hide the breakage).
        """
        from pyspark.sql import types as T

        if not isinstance(schema, T.StructType):
            raise ValueError("csv_quarantine needs an explicit StructType schema")
        full = T.StructType(
            schema.fields + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
        opts = {
            "header": True,
            "multiLine": True,
            "escape": '"',
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": "_corrupt_record",
            **options,
        }
        df = spark.read.options(**opts).schema(full).csv(path)
        # quarantine rows carry the raw line PLUS the partially-parsed
        # columns (nulls where parsing failed) — useful for repair, and
        # required: Spark refuses a plan referencing ONLY the corrupt-record
        # column of a raw file (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
        # RECORD_COLUMN; its suggested cache() workaround would pin the file
        # in executor storage forever — see docstring)
        bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
            F.col("_corrupt_record").alias("raw"),
            *[f.name for f in schema.fields],
        )
        bad.write.mode("overwrite").json(quarantine_dir)
        good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
        return Pipeline(good)

    @staticmethod
    def pipeflow_csv(spark, path: str, **options) -> Pipeline:
        """Reference-dialect CSV: Column{i} headerless synthesis +
        ConvertValue inference (CsvReader.cs:91-96, 208-234)."""
        from .csv_dialect import read_pipeflow_csv

        return Pipeline(read_pipeflow_csv(spark, path, **options))

    @staticmethod
    def json(spark, path: str, schema=None, **options) -> Pipeline:
        reader = spark.read.options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        return Pipeline(reader.json(path))

    @staticmethod
    def orc(spark, path: str, **options) -> Pipeline:
        """ORC — columnar like parquet (predicate pushdown, column pruning,
        vectorized scan all apply); built into Spark."""
        return Pipeline(spark.read.options(**options).orc(path))

    @staticmethod
    def text(spark, path: str, whole_text: bool = False, **options) -> Pipeline:
        """Line-per-row text (column ``value``); ``whole_text=True`` reads one
        row per file (small-corpus document ingestion)."""
        return Pipeline(spark.read.options(wholetext=whole_text, **options).text(path))

    @staticmethod
    def avro(spark, path: str, split_mb: float | None = None, **options) -> Pipeline:
        """Avro — row format for streaming interchange.  Prefers the JVM
        ``spark-avro`` module (external since Spark 2.4) when its jar is on
        the classpath; otherwise falls back to the repo's stdlib-only OCF
        codec (:mod:`pipeflow_spark.avro_py` — distributed ``binaryFile`` +
        ``mapInPandas`` decode, sync-marker splittable via ``split_mb``)."""
        from . import avro_py

        if split_mb is None:
            try:
                return Pipeline(spark.read.format("avro").options(**options).load(path))
            except Exception as ex:
                # only the jar-absent failure falls back; real read errors
                # (bad schema, bad path, conversion) propagate unmasked
                if not avro_py.jar_missing(ex):
                    raise
        if options:
            raise ValueError(
                "the stdlib Avro codec (spark-avro jar absent or split_mb "
                "set) supports no reader options; got %s — drop them or add "
                "the jar via --packages org.apache.spark:spark-avro_2.13:<ver>"
                % sorted(options)
            )
        return Pipeline(avro_py.read_avro(spark, path, split_mb=split_mb))

    @staticmethod
    def jdbc(spark, url: str, table: str, **options) -> Pipeline:
        return Pipeline(spark.read.format("jdbc").options(url=url, dbtable=table, **options).load())

    @staticmethod
    def jdbc_partitioned(
        spark,
        url: str,
        table: str,
        partition_column: str,
        lower_bound,
        upper_bound,
        num_partitions: int = 8,
        **options,
    ) -> Pipeline:
        """Range-partitioned JDBC read — the scale analog of the reference's
        EF ``Skip(n).Take(pageSize)`` paging loop
        (``Builder/QueryablePipelineBuilder.cs:284-312``): instead of one
        connection pulling sequential pages, ``num_partitions`` executors
        each pull a ``partition_column`` range concurrently (keyset paging,
        no OFFSET re-scans).  Pick a indexed, roughly-uniform numeric/date
        column; skewed ranges → some executors idle (use ``predicates`` via
        plain ``read.jdbc`` options for custom splits)."""
        opts = jdbc_partition_options(partition_column, lower_bound, upper_bound, num_partitions)
        return Pipeline(
            spark.read.format("jdbc").options(url=url, dbtable=table, **opts, **options).load()
        )

    @staticmethod
    def mongodb(spark, uri: str, database: str, collection: str, pipeline: list | None = None, **options) -> Pipeline:
        """MongoDB source via the spark-mongodb connector (reference:
        ``MongoReader.cs:103-141``).  The reference's pushdown DSL
        (Where/Sort/Limit/Project, ``MongoReader.cs:35-101``) maps to an
        aggregation ``pipeline`` option — Catalyst additionally pushes filters
        and projections from downstream stages into the connector.  Requires
        the ``mongo-spark-connector`` jar on the cluster (absent in this
        sandbox: ``load()`` raises with the missing data-source message)."""
        opts = mongo_options(uri, database, collection, pipeline, **options)
        return Pipeline(spark.read.format("mongodb").options(**opts).load())

    @staticmethod
    def excel(spark, path: str, **options) -> Pipeline:
        """xlsx source (reference: ``ExcelReader.cs:61-163``) — stdlib OOXML
        parser; single file driver-side, glob/directory distributed via
        binaryFile + mapInPandas.  See :mod:`pipeflow_spark.excel`."""
        from .excel import read_excel

        return Pipeline(read_excel(spark, path, **options))

    @staticmethod
    def api(spark, url: str, **options) -> Pipeline:
        """REST API source (reference: ``ApiReader.cs:54-141``) — eager
        driver-side fetch with retry/pagination/envelope semantics.  For
        distributed ingest over a known page range use
        :func:`pipeflow_spark.rest.read_api_partitioned`."""
        from .rest import read_api

        return Pipeline(read_api(spark, url, **options))

    @staticmethod
    def api_partitioned(spark, url: str, pages: int, page_size: int, schema, **options) -> Pipeline:
        from .rest import read_api_partitioned

        return Pipeline(read_api_partitioned(spark, url, pages, page_size, schema, **options))

    @staticmethod
    def s3_csv(spark, bucket: str, key: str, region: str = "us-east-1", **options) -> Pipeline:
        """S3 CSV source (reference: ``PipeFlow.cs:159-169``) — executors
        range-read the object directly over ``s3a://`` (no driver staging
        file); see :mod:`pipeflow_spark.cloud`."""
        from .cloud import s3_csv

        return s3_csv(spark, bucket, key, region, **options)

    @staticmethod
    def azure_blob_csv(spark, connection_string: str, container: str, blob: str, **options) -> Pipeline:
        """Azure Blob CSV source (reference: ``PipeFlow.cs:171-180``)."""
        from .cloud import azure_blob_csv

        return azure_blob_csv(spark, connection_string, container, blob, **options)

    @staticmethod
    def gcs_csv(spark, bucket: str, obj: str, **options) -> Pipeline:
        """Google Cloud Storage CSV source (reference: ``PipeFlow.cs:182-191``)."""
        from .cloud import google_cloud_csv

        return google_cloud_csv(spark, bucket, obj, **options)

    @staticmethod
    def table(spark, sf_dir: str, name: str) -> Pipeline:
        return Pipeline(load_table(spark, sf_dir, name))

    @staticmethod
    def collection(spark, rows, schema) -> Pipeline:
        return Pipeline(spark.createDataFrame(rows, schema))


def jdbc_partition_options(
    partition_column: str, lower_bound, upper_bound, num_partitions: int = 8
) -> dict:
    """Spark JDBC range-partitioning options (the keyset-paging analog of
    ``QueryablePipelineBuilder.cs:284-312``); validated here so a bad range
    fails at plan-build, not executor-side."""
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    numeric = isinstance(lower_bound, (int, float)) and isinstance(upper_bound, (int, float))
    if (lower_bound >= upper_bound) if numeric else (str(lower_bound) >= str(upper_bound)):
        raise ValueError("lower_bound must sort below upper_bound")
    return {
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
    }


def mongo_options(
    uri: str,
    database: str,
    collection: str,
    pipeline: list | None = None,
    batch_size: int | None = None,
    **options,
) -> dict:
    """Build spark-mongodb connector options from the reference reader/writer
    config surface (``MongoReader.cs:14-33``, ``MongoWriter.cs:20-45``):
    connection.uri/database/collection, aggregation pipeline (the pushdown
    DSL's compiled form), batch size."""
    import json as _json

    for name, value in (("uri", uri), ("database", database), ("collection", collection)):
        # MongoReader.cs / MongoWriter.cs constructor null checks
        if value is None or value == "":
            raise ValueError(f"{name} must be a non-empty string")
    opts = {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        **{str(k): str(v) for k, v in options.items()},
    }
    if pipeline is not None:
        opts["aggregation.pipeline"] = _json.dumps(pipeline)
    if batch_size is not None:
        opts["maxBatchSize"] = str(batch_size)
    return opts

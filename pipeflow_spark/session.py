"""SparkSession factory with scale-aware defaults.

The engine targets a multi-executor cluster reading ~100 TB; in this sandbox it
runs ``local[N]`` (single JVM).  All confs below are safe on both: shuffle
partitioning scales with parallelism, AQE re-plans at runtime (coalesce /
skew-join), Arrow is on for every pandas-UDF stage, and the session timezone is
pinned to UTC so results compare bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Python workers are separate processes: any pandas_udf / applyInPandas closure
# defined in this package pickles a *reference* to its module, so executors
# must be able to import ``pipeflow_spark``.  On a real cluster that's
# ``spark-submit --py-files pipeflow_spark.zip``; here we make the library
# self-shipping by exporting the repo root on PYTHONPATH before the JVM (and
# its python worker daemons) start.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def get_spark(
    app_name: str = "pipeflow_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``shuffle_partitions`` defaults to the core count: on ``local[N]`` more
    than N partitions only adds task-scheduling overhead, while on a real
    cluster the caller passes ``executors * cores`` (AQE coalesces down when
    partitions come out small, so erring high is safe there).
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(master or f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
        # RocksDB-backed streaming state: bounded executor memory at
        # 10^12-turn state sizes instead of the default on-heap HDFS store.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        # changelog checkpointing: per-batch checkpoint cost ∝ changed keys,
        # not total state size — essential once state reaches 10^9+ keys
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
        # With changelog checkpointing carrying recovery, full RocksDB
        # snapshots are only a restore-time accelerator — produce them rarely
        # (default 10 deltas caused a snapshot upload every ~10 batches, the
        # dominant per-batch cost: 45k → 113k turns/s on the bench chain when
        # combined with the buffer sizing below).  100 deltas bounds restore
        # replay to ~100 changelogs, a deliberate recovery/throughput trade.
        .config("spark.sql.streaming.stateStore.minDeltasForSnapshot", "100")
        # 64 MB memtables / block cache: micro-batch state updates stay
        # in-memory between commits instead of flushing per batch.  Worst-case
        # off-heap footprint = stores-per-executor × writeBufferSizeMB ×
        # maxWriteBufferNumber — with default 200 shuffle partitions per
        # executor-slice this stays far under executor overhead memory.
        .config("spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB", "64")
        .config("spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB", "64")
        # NOT set here: rocksdb.trackTotalNumberOfRows=false removes the
        # read-before-write that maintains numRowsTotal — measured −29 % on
        # the dedupe store's update time and −7 % full-chain wall (BENCH.md
        # §1-quater, tools/stream_phase_audit.py) — but blinds rows-in-state
        # observability.  Default stays true; flip it per-session for
        # throughput-critical dedupe-heavy chains.
    )
    # Iceberg config flip (SURVEY §7.0 / catalog.py): one command online —
    #   PIPEFLOW_ICEBERG_WAREHOUSE=/path/to/wh python <job>.py
    # resolves the Iceberg Spark runtime via spark.jars.packages (needs
    # network on first run; override the artifact with
    # PIPEFLOW_ICEBERG_PACKAGE) and registers the catalog configs, after
    # which TableCatalog auto-detects the jar and every table commit becomes
    # an Iceberg snapshot commit.  Offline (this sandbox) the flag stays
    # unset and nothing changes.
    iceberg_wh = os.environ.get("PIPEFLOW_ICEBERG_WAREHOUSE")
    if iceberg_wh:
        from .catalog import iceberg_session_conf

        builder = builder.config(
            "spark.jars.packages",
            os.environ.get(
                "PIPEFLOW_ICEBERG_PACKAGE",
                "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0",
            ),
        )
        for k, v in iceberg_session_conf(iceberg_wh).items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if iceberg_wh:
        # getOrCreate returns any pre-existing session and silently ignores
        # builder configs (and spark.jars.packages only takes effect at JVM
        # launch) — verify the catalog actually registered so the flip can't
        # silently fall back to parquet (code-review r4)
        from .catalog import DEFAULT_CATALOG

        registered = spark.conf.get(f"spark.sql.catalog.{DEFAULT_CATALOG}", None)
        if not registered:
            import warnings

            warnings.warn(
                "PIPEFLOW_ICEBERG_WAREHOUSE is set but a SparkSession already "
                "existed in this process, so the Iceberg runtime/catalog "
                "configs were NOT applied — TableCatalog will fall back to "
                "the parquet backend.  Set the env var before the first "
                "get_spark() call (fresh process).",
                stacklevel=2,
            )
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-provided parquet table (TESTDATA.md layout)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _byte_string_as_bytes(s: str) -> int:
    """Spark byteStringAsBytes semantics: optional k/m/g/t(b) suffix —
    a digits-only strip would read '128m' as 128 BYTES and silently
    disable spread()'s repartition."""
    s = s.strip().lower()
    mult = 1
    for suffix, m in (("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20),
                      ("kb", 1 << 10), ("t", 1 << 40), ("g", 1 << 30),
                      ("m", 1 << 20), ("k", 1 << 10), ("b", 1)):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    try:
        return int(s.strip()) * mult
    except ValueError:
        return 134217728  # Spark's default 128m


def _file_split_estimate(df) -> int | None:
    """Estimate the scan partition count of a file-backed DataFrame from its
    file index — WITHOUT converting the plan to an RDD (``df.rdd`` forces
    full analysis + physical planning per call and bypasses AQE's view; on a
    wide multi-stage plan that's real driver latency for a number the file
    listing already knows).  Returns None when the estimate can't be made
    safely (non-file source, or remote files we can't stat cheaply)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    raw = df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    mpb = _byte_string_as_bytes(str(raw))
    splits = 0
    for uri in files:
        if not uri.startswith("file:"):
            # remote store (s3a/abfs/…): per-file stats aren't free here;
            # callers on a real cluster pass current_partitions instead
            return None
        path = uri[len("file:"):]
        while path.startswith("//"):
            path = path[1:]
        try:
            size = os.path.getsize(path)
        except OSError:
            return None
        splits += max(1, -(-size // mpb))
    return splits


def spread(df, min_partitions: int | None = None, current_partitions: int | None = None):
    """Round-robin repartition a DataFrame **only if** its scan has fewer
    partitions than the cluster's parallelism.

    A small parquet file (one row group) scans as a single partition, which
    serializes every expression-heavy stage built on it (n-gram explode,
    signature UDFs).  At real scale the scan already has thousands of
    partitions and this is a no-op — the guard keeps it from *shrinking* a
    large scan, so it is safe to apply unconditionally in operators that fan
    out work per row.

    The current width comes from (in order): the caller's
    ``current_partitions`` hint; the file index (#files, split by
    ``maxPartitionBytes``) for local file scans; and only as a last resort
    ``df.rdd.getNumPartitions()`` — the r2 hot-path version used ``.rdd``
    unconditionally, which forces physical planning per call.
    """
    want = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    cur = current_partitions
    if cur is None:
        try:
            if len(df.inputFiles()) >= want:
                return df  # ≥1 scan task per file: already wide enough
        except Exception:
            pass
        cur = _file_split_estimate(df)
    if cur is None:
        cur = df.rdd.getNumPartitions()  # guarded fallback: non-file sources
    return df.repartition(want) if cur < want else df


_SHIPPED: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    """Ship this package to executor Python workers of an *already-running*
    session via ``addPyFile`` (idempotent per context).

    Needed when the session wasn't built by :func:`get_spark` (e.g. an
    external driver created it before importing us) — the PYTHONPATH export
    above only helps if it happens before the JVM starts.  Cluster deploys
    get the same effect from ``spark-submit --py-files pipeflow_spark.zip``.
    """
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.join(_REPO_ROOT, "pipeflow_spark")
    zip_path = os.path.join(tempfile.gettempdir(), "pipeflow_spark_pyfiles.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, _REPO_ROOT))
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)

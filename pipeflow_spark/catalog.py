"""Table catalog with a format config-flip: Iceberg when the runtime jar is
on the classpath, parquet snapshot-pointer tables otherwise.

This materializes SURVEY.md §7.0's plan — "a parquet-backed table layout with
the same commit semantics behind a ``Catalog`` interface so the Iceberg path
is a config flip".  Both formats give readers an atomic snapshot view:

* ``iceberg`` — tables are catalog identifiers (``<catalog>.<ns>.<name>``);
  writes go through the DataFrameWriterV2 API, keyed upsert is a real
  ``MERGE INTO``, and Iceberg's metadata-pointer commit provides snapshot
  isolation.  Session must be built with :func:`iceberg_session_conf`.
* ``parquet`` (sandbox default — no Iceberg jar ships in this container) —
  tables are ``<warehouse>/<name>`` dirs using the snapshot-pointer commit
  protocol of :func:`..sinks.upsert_parquet`: write a fresh ``snapshot-*``
  dir, atomically rename the ``_CURRENT`` pointer.  Same reader guarantee
  (exactly one complete snapshot, never a mix); keyed tables written through
  :meth:`TableCatalog.upsert` also support VERSION-AS-OF time travel
  (:meth:`TableCatalog.read` with ``version=``), retention bounded by the
  writer's ``keep_snapshots``.

The streaming exactly-once sink (:mod:`..streaming.exactly_once`) rides the
same protocol; on a real cluster flipping ``format="iceberg"`` upgrades every
table commit to an Iceberg snapshot commit with no operator changes.

Reference parity: PipeFlow's keyed ``ON CONFLICT`` upsert
(``/root/reference/PipeFlow/PostgreSQL/PostgreSqlWriter.cs:220-247``) is the
semantic model for :meth:`TableCatalog.upsert`.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import sinks

DEFAULT_CATALOG = "local"
DEFAULT_NAMESPACE = "db"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def iceberg_session_conf(
    warehouse: str, catalog: str = DEFAULT_CATALOG
) -> dict[str, str]:
    """Builder configs for a Hadoop-catalog Iceberg session (public Iceberg
    quickstart layout).  Apply before ``getOrCreate``; no-op value-wise if the
    jar is absent (Spark ignores unknown catalog impls until first use)."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def merge_into_sql(
    target: str, source_view: str, columns: Sequence[str], keys: Sequence[str], do_update: bool = True
) -> str:
    """Iceberg/ANSI ``MERGE INTO`` for keyed upsert — ``do_update`` toggles
    DO UPDATE vs DO NOTHING semantics (PostgreSqlWriter.cs:220-247)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    non_keys = [c for c in columns if c not in keys]
    cols = ", ".join(columns)
    vals = ", ".join(f"s.{c}" for c in columns)
    stmt = f"MERGE INTO {target} t USING {source_view} s ON {on}"
    if do_update and non_keys:
        sets = ", ".join(f"t.{c} = s.{c}" for c in non_keys)
        stmt += f" WHEN MATCHED THEN UPDATE SET {sets}"
    stmt += f" WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    return stmt


def _iceberg_transform(spec: str):
    """Map a partition spec string to the pyspark DSv2 partitioning function
    for ``writeTo(...).partitionedBy`` (Iceberg branch).  ``truncate`` has no
    pyspark partitioning wrapper — use the parquet branch or SQL DDL."""
    from pyspark.sql.functions import partitioning

    from .operators.partition import parse_spec

    kind, n, col = parse_spec(spec)
    if kind == "identity":
        return F.col(col)
    if kind == "bucket":
        return partitioning.bucket(n, col)
    if kind == "truncate":
        raise ValueError(
            "truncate(...) has no pyspark partitioning function; create the "
            "Iceberg table via SQL DDL (PARTITIONED BY truncate(W, col)) or "
            "use the parquet branch"
        )
    return getattr(partitioning, kind)(col)


class TableCatalog:
    """Format-dispatching table store.  ``format=None`` auto-detects:
    ``iceberg`` when the runtime jar is present, else ``parquet``."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        format: str | None = None,  # noqa: A002 - mirrors DataFrameWriter arg
        catalog: str = DEFAULT_CATALOG,
        namespace: str = DEFAULT_NAMESPACE,
    ) -> None:
        if format not in (None, "iceberg", "parquet"):
            raise ValueError(f"unknown table format: {format!r}")
        self.spark = spark
        self.warehouse = warehouse
        self.format = format or ("iceberg" if iceberg_available(spark) else "parquet")
        if self.format == "iceberg" and not iceberg_available(spark):
            raise RuntimeError("format='iceberg' but no Iceberg runtime jar on the classpath")
        self.catalog = catalog
        self.namespace = namespace

    # -- identifiers --------------------------------------------------------

    def ident(self, table: str) -> str:
        """Catalog identifier (iceberg) or table directory (parquet)."""
        if self.format == "iceberg":
            return f"{self.catalog}.{self.namespace}.{table}"
        return os.path.join(self.warehouse, table)

    def exists(self, table: str) -> bool:
        if self.format == "iceberg":
            return self.spark.catalog.tableExists(self.ident(table))
        try:
            return sinks._current_snapshot(self.ident(table)) is not None
        except OSError:
            return False

    # -- IO ------------------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_specs: list[str] | None = None,
    ) -> None:
        """``overwrite`` replaces the table snapshot atomically; ``append``
        adds rows (parquet: previous snapshot unioned into the new one, so the
        pointer flip stays the only commit point).

        ``partition_specs`` lays the table out by Iceberg-style hidden
        partition transforms (``operators/partition.py`` — e.g.
        ``["days(ts)", "bucket(16, user_id)"]``).  Iceberg branch: mapped to
        the native DSv2 ``partitionedBy`` transforms (``truncate`` has no
        pyspark partitioning function and raises there).  Parquet branch:
        the snapshot dir is written via ``write_partitioned``; read it with
        :meth:`read_hidden` to get automatic predicate→partition pruning.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unsupported mode: {mode!r}")
        if self.format == "iceberg":
            if partition_specs and mode == "append":
                # DataFrameWriterV2.partitionedBy only takes effect on
                # create/replace; append would silently ignore it
                raise ValueError(
                    "partition_specs cannot change on append — the Iceberg "
                    "layout is fixed at table creation (overwrite to re-lay)"
                )
            w = df.writeTo(self.ident(table))
            if partition_specs:
                w = w.partitionedBy(*[_iceberg_transform(s) for s in partition_specs])
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        if mode == "append" and self.exists(table):
            stored = self._load_specs(table)
            if partition_specs is None:
                partition_specs = stored
            elif stored is not None and list(partition_specs) != stored:
                raise ValueError(
                    f"partition_specs {partition_specs} differ from the "
                    f"table's persisted layout {stored} — overwrite to re-lay"
                )
            df = self.read_hidden(table, partition_specs or []).unionByName(df)
        self._parquet_snapshot_write(df, table, partition_specs)

    # -- hidden-partition spec metadata (parquet branch) ----------------------
    #
    # The spec list travels INSIDE each snapshot directory and is written
    # BEFORE the atomic pointer flip (_publish_commit), so the single commit
    # point covers data + layout metadata together: a crash anywhere in the
    # write leaves the previous snapshot (with its own specs) fully intact,
    # and a committed snapshot can never be missing or carrying a stale spec
    # list (ADVICE r3 — the old table-level _partition_specs.json was saved
    # after the flip, leaving a crash window that violated the protocol).

    def _load_specs(self, table: str) -> list[str] | None:
        import json

        snap = sinks._current_snapshot(self.ident(table))
        if snap is not None:
            try:
                with open(os.path.join(snap, "_partition_specs.json")) as f:
                    return json.load(f) or None
            except FileNotFoundError:
                pass
        # legacy location (tables written before the in-snapshot protocol)
        try:
            with open(os.path.join(self.ident(table), "_partition_specs.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def read_hidden(
        self,
        table: str,
        partition_specs: list[str] | None = None,
        filters: list[tuple[str, str, object]] | None = None,
    ) -> DataFrame:
        """Read a hidden-partitioned parquet table: source-column ``filters``
        translate to partition predicates (driver-side directory pruning) and
        the layout columns stay hidden.  ``partition_specs`` defaults to the
        layout persisted at write time (``_partition_specs.json``) — callers
        normally never repeat it.  Iceberg branch: the engine already does
        this natively — plain ``read`` + row filters."""
        from .operators import partition as _pt

        if self.format == "iceberg":
            df = self.read(table)
            for col, op, value in filters or []:
                expr = {"=": F.col(col) == value, "<": F.col(col) < value,
                        "<=": F.col(col) <= value, ">": F.col(col) > value,
                        ">=": F.col(col) >= value}[op]
                df = df.filter(expr)
            return df
        if partition_specs is None:
            partition_specs = self._load_specs(table) or []
        snap = sinks._current_snapshot(self.ident(table))
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot for table {table!r}")
        return _pt.scan(self.spark, snap, partition_specs, filters=filters)

    def _parquet_snapshot_write(
        self, df: DataFrame, table: str, partition_specs: list[str] | None = None
    ) -> None:
        import json
        import uuid

        path = self.ident(table)
        os.makedirs(path, exist_ok=True)
        snap = f"snapshot-{uuid.uuid4().hex[:12]}"
        if partition_specs:
            from .operators import partition as _pt

            _pt.write_partitioned(df, os.path.join(path, snap), partition_specs)
        else:
            df.write.mode("overwrite").parquet(os.path.join(path, snap))
        # layout metadata lands inside the snapshot BEFORE the pointer flip —
        # the flip is the single commit point for data AND specs (underscore
        # prefix keeps the file invisible to parquet directory scans)
        with open(os.path.join(path, snap, "_partition_specs.json"), "w") as f:
            json.dump(list(partition_specs or []), f)
        prev = sinks._current_snapshot(path)
        sinks._publish_commit(path, snap)  # atomic flip, commit-log protocol
        if prev and os.path.basename(prev).startswith("snapshot-"):
            shutil.rmtree(prev, ignore_errors=True)

    def read(self, table: str, version: int | None = None) -> DataFrame:
        """Current snapshot, or ``VERSION AS OF version`` when given (iceberg:
        real snapshot-id time travel; parquet: retained ``snapshot-<n>`` dirs
        of the pointer protocol)."""
        if self.format == "iceberg":
            if version is not None:
                return self.spark.sql(
                    f"SELECT * FROM {self.ident(table)} VERSION AS OF {version}"
                )
            return self.spark.read.table(self.ident(table))
        df = sinks.read_upsert_table(self.spark, self.ident(table), version=version)
        # hidden-partitioned tables: drop the derived layout columns that
        # Spark infers from the directory names, so every read path honors
        # the hidden contract (identity specs' column IS the data — kept)
        specs = self._load_specs(table)
        if specs:
            from .operators import partition as _pt

            drop = [
                _pt.partition_col_name(sp)
                for sp in specs
                if _pt.parse_spec(sp)[0] != "identity"
            ]
            present = [c for c in drop if c in df.columns]
            if present:
                df = df.drop(*present)
        return df

    def snapshots(self, table: str) -> list[dict]:
        """Snapshot inventory (``version`` / ``is_current`` per entry)."""
        if self.format == "iceberg":
            rows = self.spark.sql(
                f"SELECT * FROM {self.ident(table)}.snapshots ORDER BY committed_at"
            ).collect()
            # current = the main branch ref, not the last row: .snapshots row
            # order is unspecified, and after a rollback the current snapshot
            # is not the latest-committed one.
            try:
                ref = self.spark.sql(
                    f"SELECT snapshot_id FROM {self.ident(table)}.refs WHERE name = 'main'"
                ).collect()
                cur = ref[0].snapshot_id if ref else None
            except Exception:
                cur = None
            if cur is None and rows:
                cur = rows[-1].snapshot_id
            return [
                {"version": r.snapshot_id, "dir": None, "is_current": r.snapshot_id == cur}
                for r in rows
            ]
        return sinks.snapshots(self.ident(table))

    def upsert(
        self,
        df: DataFrame,
        table: str,
        keys: Sequence[str],
        do_update: bool = True,
        order_by: Sequence[str] | None = None,
        keep_snapshots: int = 2,
        change_feed: bool = False,
    ) -> None:
        """Keyed MERGE (ON CONFLICT DO UPDATE / DO NOTHING)."""
        if self.format == "iceberg":
            if change_feed:
                raise NotImplementedError(
                    "change_feed on the iceberg backend: use Iceberg's own "
                    "changelog (CALL system.create_changelog_view) instead"
                )
            src = f"__merge_src_{table}"
            sinks._dedupe_incoming(df, list(keys), order_by).createOrReplaceTempView(src)
            if not self.exists(table):
                self.spark.table(src).writeTo(self.ident(table)).create()
            else:
                self.spark.sql(
                    merge_into_sql(self.ident(table), src, df.columns, list(keys), do_update)
                )
            self.spark.catalog.dropTempView(src)
            return
        sinks.upsert_parquet(
            self.spark,
            df,
            self.ident(table),
            keys,
            do_update=do_update,
            order_by=order_by,
            keep_snapshots=keep_snapshots,
            change_feed=change_feed,
        )

    def read_changes(
        self,
        table: str,
        starting_version: int | None = None,
        ending_version: int | None = None,
    ) -> DataFrame:
        """CDC rows a keyed upsert recorded (``change_feed=True``) — see
        :func:`pipeflow_spark.sinks.read_change_feed`."""
        if self.format == "iceberg":
            raise NotImplementedError(
                "iceberg changelog reads: CALL system.create_changelog_view"
            )
        return sinks.read_change_feed(
            self.spark, self.ident(table), starting_version, ending_version
        )

    def rollback(self, table: str, version: int) -> None:
        """Roll the table's main ref back to an older snapshot — an O(1)
        ref move, no data rewrite, history stays monotonic (iceberg:
        ``rollback_to_snapshot`` procedure; parquet: atomic ``_CURRENT``
        pointer re-point, ``sinks.rollback_snapshot``)."""
        if self.format == "iceberg":
            self.spark.sql(
                f"CALL {self.catalog}.system.rollback_to_snapshot"
                f"('{self.namespace}.{table}', {version})"
            )
            return
        sinks.rollback_snapshot(self.ident(table), version)

    def drop(self, table: str) -> None:
        if self.format == "iceberg":
            self.spark.sql(f"DROP TABLE IF EXISTS {self.ident(table)}")
            return
        shutil.rmtree(self.ident(table), ignore_errors=True)

"""Slowly-changing-dimension (type 2) operators: build a versioned dimension
from a change stream, and point-in-time-enrich facts against it.

PipeFlow's enrichment story is a plain ``Transform`` over a pre-joined input
(``PipeFlow/Pipeline.cs:46-52`` — the reference has no temporal join at all);
any user replaying history through it gets the dimension's CURRENT values
applied to OLD facts.  SCD2 is the standard fix: each dimension key carries
``[valid_from, valid_to)`` version intervals, and facts join to the version
whose interval covers the fact timestamp.

Scale shape:

* :func:`scd2_from_changes` is two windows over the change stream partitioned
  by the dimension key — change streams are dimension-sized (customers,
  vendors, configs), orders of magnitude smaller than fact tables, so the
  shuffle is cheap at any corpus scale.
* :func:`scd2_enrich` is an EQUI-join on the dimension key with the interval
  predicates as join filters: SortMergeJoin/shuffled-hash on the key, never a
  broadcast-nested-loop (the trap of writing the interval check as the only
  join condition).  Per-key version counts are small, so the residual filter
  scans a handful of rows per fact.  For a dimension small enough to
  broadcast, Catalyst/AQE picks BroadcastHashJoin automatically — the range
  predicates ride along as filters either way.

Interval semantics: a change is effective AT its timestamp (inclusive
``valid_from``), superseded by the next change (exclusive ``valid_to``;
``NULL`` = current version).  Two changes on the same key at the same
timestamp produce a zero-width ``[ts, ts)`` interval for the earlier one
(deterministic tie-break on ``order_cols``) — it matches no fact, the later
change wins, on both engines identically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_from_changes", "scd2_enrich", "scd2_apply_batch"]


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def scd2_from_changes(
    changes: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    attr_cols: str | Sequence[str],
    order_cols: str | Sequence[str] = (),
    collapse_unchanged: bool = True,
) -> DataFrame:
    """Build an SCD2 dimension from a change stream: one row per retained
    version with ``valid_from`` (the change's ``ts_col``) and ``valid_to``
    (the NEXT retained change's timestamp; ``NULL`` for the current version).

    ``collapse_unchanged`` drops no-op changes (every ``attr_cols`` value
    null-safe-equal to the previous version) BEFORE intervals are cut, so a
    noisy change feed that re-emits the same attributes doesn't fragment the
    history.  ``order_cols`` breaks same-timestamp ties deterministically.

    Output: ``key_cols + attr_cols + (valid_from, valid_to)``.
    """
    keys, attrs = _as_list(key_cols), _as_list(attr_cols)
    order = [F.col(ts_col)] + [F.col(c) for c in _as_list(order_cols)]
    w = Window.partitionBy(*keys).orderBy(*order)
    df = changes
    if collapse_unchanged:
        changed = F.lit(False)
        for a in attrs:
            changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
        first = F.lag(ts_col).over(w).isNull()
        df = df.withColumn("__keep", first | changed).filter("__keep").drop("__keep")
    return df.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )


def scd2_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: str | Sequence[str],
    fact_ts: str,
    how: str = "left",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time enrich: join each fact to the dimension version valid at
    ``fact_ts`` — ``fact_ts >= valid_from AND (valid_to IS NULL OR fact_ts <
    valid_to)``.  Version intervals partition each key's timeline, so a
    matched fact gains exactly one dimension row; ``how='left'`` keeps facts
    predating the first version (dimension columns NULL).

    The join keys stay equi (see module docstring) — the interval check is a
    residual filter, not the join condition.
    """
    keys = _as_list(key_cols)
    # Re-project the dimension under internal names: the common case builds
    # dim and facts from the SAME source DataFrame (a self-join), where
    # facts[k] == dim[k] resolves both sides to one attribute (Spark warns
    # "trivially true equals predicate").  Fresh aliases force distinct
    # attribute ids on the dimension side.
    d = dim.select([F.col(c).alias(f"__scd_{c}") for c in dim.columns])
    cond = None
    for k in keys:
        eq = facts[k] == d[f"__scd_{k}"]
        cond = eq if cond is None else cond & eq
    cond = (
        cond
        & (facts[fact_ts] >= d[f"__scd_{valid_from}"])
        & (
            d[f"__scd_{valid_to}"].isNull()
            | (facts[fact_ts] < d[f"__scd_{valid_to}"])
        )
    )
    attr_out = [c for c in dim.columns if c not in keys + [valid_from, valid_to]]
    # a dim attribute aliased back onto a name facts already uses would make
    # the output ambiguous (two columns, one name) — refuse loudly (ADVICE r3)
    clash = [c for c in attr_out if c in facts.columns]
    if clash:
        raise ValueError(
            f"scd2_enrich: dimension attribute column(s) {clash} collide with "
            "fact columns — rename them on one side before enriching"
        )
    joined = facts.join(d, cond, how)
    # drop the dimension's duplicate key columns and the interval bounds
    out_cols: list[Column] = [facts[c] for c in facts.columns]
    out_cols += [d[f"__scd_{c}"].alias(c) for c in attr_out]
    return joined.select(*out_cols)


def scd2_apply_batch(
    batch_changes: DataFrame,
    table_path: str,
    key_cols: str | Sequence[str],
    ts_col: str,
    attr_cols: str | Sequence[str],
    order_cols: str | Sequence[str] = (),
    keep_snapshots: int = 2,
) -> None:
    """Apply one micro-batch of dimension changes to a persistent SCD2
    version table (snapshot-pointer parquet, ``sinks.upsert_parquet``) —
    the incremental-maintenance step behind
    :meth:`~pipeflow_spark.streaming.StreamingPipeline.start_scd2`.

    The table stores UNCOLLAPSED versions: every change is a version row
    ``(keys, order_cols, attrs, valid_from, valid_to)``, so the version set
    is bijective with the change log and a key's history can be rebuilt
    exactly from its table rows — which is what makes arbitrarily-late
    changes correct: collapsing no-op changes would lose rows that a late
    interleaving change later needs (a collapsed ``bronze`` re-emit at t₂
    matters the moment a late ``gold`` change lands at t₁․₅).  Readers who
    want collapsed history apply :func:`scd2_from_changes`'s collapse (one
    window) on read.

    Per batch: the AFFECTED keys' existing version rows are converted back
    to change rows, unioned with the batch's changes, exactly-deduplicated
    (idempotent replay: a re-presented batch row collides with the version
    row it already created and the distinct collapses them), re-cut into
    intervals (:func:`scd2_from_changes`, collapse off), and committed as a
    keyed DELETE+INSERT of those key groups (``group_replace`` MERGE) under
    one atomic snapshot-pointer flip.  Unaffected keys' rows are carried
    over untouched.

    Scale shape: work per batch is O(batch + affected keys' version rows) —
    the semi-join prunes the rebuild to touched keys; the snapshot rewrite
    itself is the pointer-table protocol's cost (an Iceberg/Delta MERGE
    rewrites only matched files).  No watermark is needed and none is used:
    lateness never drops a change, it just rebuilds that key.
    """
    from ..sinks import read_upsert_table, upsert_parquet

    spark = batch_changes.sparkSession
    keys = _as_list(key_cols)
    carry = _as_list(order_cols)
    attrs = _as_list(attr_cols)
    cols = keys + [ts_col] + carry + attrs
    batch = batch_changes.select(*cols)

    affected = batch.select(*keys).distinct()
    try:
        current = read_upsert_table(spark, table_path)
        has_table = True
    except FileNotFoundError:
        # ONLY the no-committed-snapshot signal may mean "first batch": a
        # broader except would treat a transient read failure as an empty
        # table and group_replace would then erase the touched keys' history
        has_table = False
    if has_table:
        existing = (
            current.join(affected, keys, "semi")
            .select(*keys, F.col("valid_from").alias(ts_col), *carry, *attrs)
            .select(*cols)
        )
        changes = existing.unionByName(batch).distinct()
    else:
        changes = batch.distinct()

    versions = scd2_from_changes(
        changes,
        keys,
        ts_col,
        # order_cols ride as pseudo-attributes so they stay on the version
        # row (collapse is off, so they never influence retention)
        carry + attrs,
        order_cols=carry,
        collapse_unchanged=False,
    )
    upsert_parquet(
        spark,
        versions,
        table_path,
        keys,
        do_update=True,
        keep_snapshots=keep_snapshots,
        group_replace=True,
    )

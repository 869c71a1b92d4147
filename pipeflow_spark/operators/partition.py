"""Iceberg-style hidden partitioning: write-time partition TRANSFORMS and
read-time predicate-to-partition translation.

Iceberg's core layout idea (public spec, iceberg.apache.org/spec/#partitioning)
is that tables are partitioned by a *transform of a source column* —
``days(ts)``, ``bucket(16, user_id)``, ``truncate(4, code)`` — and readers
never mention the partition column: the engine translates predicates on the
SOURCE column into partition predicates automatically ("hidden" because the
query author cannot get it wrong, unlike Hive-style
``WHERE dt = '2024-01-01'`` layouts that silently full-scan when the derived
column is forgotten).

This module reproduces that contract over plain partitioned parquet:

* :func:`write_partitioned` materializes the transform columns and writes
  ``partitionBy`` them (directory layout = transform values, exactly like an
  Iceberg partition spec of that shape).
* :func:`scan` reads back and, given ordinary predicates on source columns,
  adds the implied partition-column predicates so Spark's partition pruning
  (visible as ``PartitionFilters`` in the scan node) drops whole directories
  before any file IO — then re-applies the original row-level predicate.

Transform semantics (divergences from the Iceberg spec noted):

* ``identity(c)`` — the column itself.
* ``days(c)`` / ``hours(c)`` / ``months(c)`` / ``years(c)`` — calendar
  truncation of a timestamp, encoded as sortable strings
  (``2024-01-31`` / ``2024-01-31-23`` / ``2024-01`` / ``2024``), so range
  predicates on the timestamp translate to string-range partition predicates
  (the spec stores ordinal ints; strings keep the directory names readable
  and order-equivalent).
* ``bucket(n, c)`` — ``pmod(xxhash64(c), n)``.  The spec mandates
  murmur3-x86-32; Spark exposes ``xxhash64`` natively, which has the same
  uniformity contract.  Only EQUALITY predicates prune bucket partitions.
* ``truncate(w, c)`` — strings: first ``w`` chars; integral types:
  ``c - pmod(c, w)`` (spec-identical, floors toward -inf for negatives).

At 100 TB the win is the same as Iceberg's: a ``ts >= X`` filter on a
``days(ts)``-partitioned corpus prunes to the trailing directories in the
driver (file-index metadata only), and a point lookup on a bucketed key
reads 1/n of the data.  Combine with ZORDER (operators/zorder.py) inside
partitions and manifest min/max skipping (read_pruned) across files.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["parse_spec", "transform_column", "write_partitioned", "scan"]

_SPEC_RE = re.compile(
    r"^\s*(identity|days|hours|months|years|bucket|truncate)\s*\("
    r"\s*(?:(\d+)\s*,)?\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$"
)

_TIME_FMT = {
    "years": "yyyy",
    "months": "yyyy-MM",
    "days": "yyyy-MM-dd",
    "hours": "yyyy-MM-dd-HH",
}


def parse_spec(spec: str) -> tuple[str, int | None, str]:
    """``'bucket(16, user_id)'`` → ``('bucket', 16, 'user_id')``;
    ``'days(ts)'`` → ``('days', None, 'ts')``."""
    m = _SPEC_RE.match(spec)
    if not m:
        raise ValueError(
            f"bad partition spec {spec!r} — expected transform(col) or "
            "transform(N, col) with transform in identity/days/hours/months/"
            "years/bucket/truncate"
        )
    kind, n, col = m.group(1), m.group(2), m.group(3)
    if kind in ("bucket", "truncate"):
        if n is None:
            raise ValueError(f"{kind} needs a width: {kind}(N, col)")
        return kind, int(n), col
    if n is not None:
        raise ValueError(f"{kind} takes no width argument")
    return kind, None, col


def partition_col_name(spec: str) -> str:
    kind, n, col = parse_spec(spec)
    return f"{col}_{kind}" if n is None and kind != "identity" else (
        col if kind == "identity" else f"{col}_{kind}{n}"
    )


def transform_column(spec: str, dtype: str | None = None) -> tuple[str, Column]:
    """The derived partition column for a spec: ``(name, Column)``.
    ``dtype`` disambiguates truncate (string vs integral semantics)."""
    kind, n, col = parse_spec(spec)
    name = partition_col_name(spec)
    c = F.col(col)
    if kind == "identity":
        return name, c
    if kind in _TIME_FMT:
        return name, F.date_format(c, _TIME_FMT[kind])
    if kind == "bucket":
        return name, F.pmod(F.xxhash64(c), F.lit(n)).cast("int")
    # truncate
    if dtype is not None and dtype.startswith("string"):
        return name, F.substring(c, 1, n)
    if dtype is None:
        raise ValueError(
            "truncate needs the column dtype ('string' or an integral type) "
            "to pick substring vs modular semantics"
        )
    return name, (c - F.pmod(c, F.lit(n))).cast(dtype)


def _specs_with_types(df: DataFrame, specs: list[str]) -> list[tuple[str, str, Column]]:
    dtypes = dict(df.dtypes)
    out = []
    for spec in specs:
        _, _, col = parse_spec(spec)
        if col not in dtypes:
            raise ValueError(f"partition spec {spec!r}: column {col!r} not in DataFrame")
        name, expr = transform_column(spec, dtypes[col])
        out.append((spec, name, expr))
    return out


def write_partitioned(
    df: DataFrame,
    path: str,
    specs: list[str],
    mode: str = "overwrite",
) -> list[str]:
    """Write ``df`` partitioned by the transform columns of ``specs``
    (materialized just for layout; hidden from the logical schema on read
    via :func:`scan`).  Returns the partition column names."""
    cols = _specs_with_types(df, specs)
    out = df
    for _, name, expr in cols:
        out = out.withColumn(name, expr)
    out.write.mode(mode).partitionBy([name for _, name, _ in cols]).parquet(path)
    return [name for _, name, _ in cols]


def _translate(
    spec: str, name: str, dtype: str, op: str, value
) -> Column | None:
    """Partition predicate implied by ``<source col> <op> <value>`` under a
    transform, or None when the transform cannot prune that operator
    (sound: never drops a partition that could hold a matching row)."""
    kind, n, _ = parse_spec(spec)
    p = F.col(name)
    if kind == "identity":
        return {
            "=": p == value, "<": p < value, "<=": p <= value,
            ">": p > value, ">=": p >= value,
        }[op]
    if kind in _TIME_FMT:
        # date_format is monotone non-decreasing in the timestamp, so range
        # predicates translate with the boundary bucket kept inclusive.
        # Compare as strings: partition-directory type inference may read
        # 'yyyy-MM-dd' values back as DATE, and the format strings are
        # order-equivalent to their timestamps either way.
        p = p.cast("string")
        b = F.date_format(F.lit(value).cast("timestamp"), _TIME_FMT[kind])
        return {
            "=": p == b, "<": p <= b, "<=": p <= b, ">": p >= b, ">=": p >= b,
        }[op]
    if kind == "bucket":
        if op != "=":
            return None  # hash order is unrelated to value order
        # xxhash64 is TYPE-sensitive: hashing an int literal against a
        # bigint-hashed partition layout silently prunes the true partition
        # away — cast the probe literal to the source column's exact type.
        return p == F.pmod(F.xxhash64(F.lit(value).cast(dtype)), F.lit(n)).cast("int")
    # truncate: monotone for both string-prefix and integral flooring
    if dtype.startswith("string"):
        b = F.lit(str(value)[:n])
    else:
        b = F.lit(value - (value % n))
    return {
        "=": p == b, "<": p <= b, "<=": p <= b, ">": p >= b, ">=": p >= b,
    }[op]


def scan(
    spark: SparkSession,
    path: str,
    specs: list[str],
    filters: list[tuple[str, str, object]] | None = None,
    keep_partition_cols: bool = False,
) -> DataFrame:
    """Read a :func:`write_partitioned` table, translating each
    ``(source_col, op, value)`` filter into its partition predicate (pruned
    in the driver from directory metadata) AND re-applying it row-level.
    Filters whose transform cannot prune (e.g. a range over a bucket) still
    apply row-level — correctness never depends on pruning.

    The partition columns are dropped from the result unless
    ``keep_partition_cols`` — hidden partitioning means callers think in
    source columns only.
    """
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    names = {}
    for spec in specs:
        names[spec] = partition_col_name(spec)
    by_col: dict[str, list[str]] = {}
    for spec in specs:
        _, _, col = parse_spec(spec)
        by_col.setdefault(col, []).append(spec)
    for col, op, value in filters or []:
        row = {
            "=": F.col(col) == value, "<": F.col(col) < value,
            "<=": F.col(col) <= value, ">": F.col(col) > value,
            ">=": F.col(col) >= value,
        }[op]
        df = df.filter(row)
        for spec in by_col.get(col, []):
            name = names[spec]
            part = _translate(spec, name, dtypes.get(col, "string"), op, value)
            if part is not None:
                df = df.filter(part)
    if not keep_partition_cols:
        # identity specs' partition column IS the source column — hiding the
        # layout must not hide the user's data
        drop = [
            names[s] for s in specs if parse_spec(s)[0] != "identity"
        ]
        if drop:
            df = df.drop(*drop)
    return df

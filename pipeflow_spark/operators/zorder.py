"""Z-order (Morton-curve) clustered writes for multi-column scan pruning.

At 100 TB, the cheapest query is the one that never reads the file: parquet
scans skip whole files and row groups whose column min/max stats exclude the
predicate.  A sort on ONE column gives perfect pruning for that column and
none for any other; interleaving the bits of several columns' bucket ids
(the Morton / Z-order curve) makes rows that are close in *every* dimension
land in the same files, so range predicates on ANY prefix-free subset of the
clustered columns prune.  This is the same layout primitive Delta Lake's
``OPTIMIZE ZORDER BY`` and Iceberg's ``rewrite_data_files(strategy=>'sort',
sort_order=>'zorder(...)')`` expose; here it is pure Column algebra over a
``repartitionByRange`` write, so it needs no table format support.

Cost model (why this is worth a shuffle): the clustering write is ONE range
shuffle, paid once; every future scan with a selective predicate on any of
the clustered columns reads ``O(selectivity)`` of the data instead of all of
it.  For append-mostly corpora, cluster per written partition/snapshot —
pruning stats are per-file, so global re-sorting is never required.

Everything is JVM Column algebra (``width_bucket`` + bit shifts) — no UDF,
no driver loop over rows; the only driver-side work is one 2×k-scalar
min/max aggregate to fix the bucket domains.

Reference analog: none (the reference writes row-at-a-time CSV,
``PipeFlow/CsvWriter.cs``); training-data / lakehouse extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, Column]:
    """Return ``(df, key)`` where ``key`` is the Morton interleave of each
    column's ``width_bucket`` id over its [min, max] range, ``bits`` bits per
    dimension (default 256 buckets/dim; ``len(cols) * bits`` must fit a
    bigint).  The min/max aggregate is one bounded job (2×k scalars to the
    driver).  NULLs map to bucket 0 (cluster together, prune away)."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 62:
        raise ValueError(f"{len(cols)} cols × {bits} bits overflows a bigint key")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
    ).collect()[0]
    n_buckets = 1 << bits
    buckets: list[Column] = []
    for c in cols:
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        if lo is None or hi is None or lo == hi:
            buckets.append(F.lit(0).cast("bigint"))
            continue
        # width_bucket ∈ [1, n_buckets] on [lo, hi]; clamp + shift to [0, n_buckets)
        b = F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets))
        b = F.least(F.greatest(b - 1, F.lit(0)), F.lit(n_buckets - 1))
        buckets.append(F.coalesce(b, F.lit(0)).cast("bigint"))
    ndims = len(buckets)
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for d, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * ndims + d))
    return df, key


def write_zordered(
    df: DataFrame, path: str, cols: list[str], files: int = 8, bits: int = 8
) -> None:
    """Write ``df`` as ``files`` parquet files clustered on the Z-order key
    of ``cols``: range-partition on the key (contiguous curve segments per
    file → tight per-file min/max on every clustered column), then sort
    within each partition so row groups inside a file prune too."""
    clustered, key = zorder_key(df, cols, bits=bits)
    (
        clustered.withColumn("_zkey", key)
        .repartitionByRange(files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max of ``cols`` for a parquet directory — the same stats
    the scan's pruning consults, surfaced as data so layout quality is
    testable: mean per-file span / global span ≈ fraction of files a point
    predicate must read."""
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("_file").agg(*aggs)

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


# -- manifest-based file skipping (the Iceberg manifest / Delta stats analog) --

MANIFEST_NAME = "_manifest.json"


def write_manifest(spark, path: str, cols: list[str]) -> dict:
    """Write a driver-side file→min/max manifest for ``cols`` next to the
    parquet files (the Iceberg manifest-entry / Delta per-file-stats analog).

    Spark's parquet scan already skips row groups via footer stats, but at
    100 TB the scan still has to *list and plan tasks for every file*;
    manifest pruning (:func:`read_pruned`) selects the file list on the
    driver from one small JSON before the scan exists, so excluded files cost
    nothing — no tasks, no footer reads.  Stats are computed with one Spark
    job (``input_file_name`` groupBy); timestamps/dates are stored ISO (their
    lexicographic order = chronological order), numerics natively.
    """
    import json
    import os

    rows = file_stats(spark, path, cols).collect()

    def enc(v):
        return v if v is None or isinstance(v, (int, float, str)) else v.isoformat()

    manifest = {
        os.path.basename(r["_file"]): {c: [enc(r[f"min_{c}"]), enc(r[f"max_{c}"])] for c in cols}
        for r in rows
    }
    tmp = os.path.join(path, f".{MANIFEST_NAME}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(path, MANIFEST_NAME))  # atomic publish
    return manifest


def prune_files(manifest: dict, predicates: dict[str, tuple]) -> list[str]:
    """File names whose [min, max] intervals intersect every predicate range.

    ``predicates``: ``{col: (lo, hi)}`` inclusive ranges (point lookup =
    ``(v, v)``); values must be encoded like the manifest stores them
    (numerics native, timestamps ISO strings).  A file whose stats are
    ``[None, None]`` (all-NULL column) is skippable: range/equality
    predicates never match NULL.  Missing stats for a predicate column keep
    the file (prune must never be unsound)."""
    keep = []
    for fname, stats in manifest.items():
        ok = True
        for c, (lo, hi) in predicates.items():
            if c not in stats:
                continue  # no stats -> cannot exclude
            fmin, fmax = stats[c]
            if fmin is None or fmax is None:
                ok = False  # all-NULL file: no row can satisfy a range predicate
                break
            if fmax < lo or fmin > hi:
                ok = False
                break
        if ok:
            keep.append(fname)
    return sorted(keep)


def read_pruned(spark, path: str, predicates: dict[str, tuple]):
    """Scan only the files the manifest can't exclude, then re-apply the
    predicates as real filters (pruning is an optimization, never the
    correctness mechanism).  Returns ``(df, n_files_read, n_files_total)``.

    Falls back to a full scan (with filters) when no manifest exists."""
    import json
    import os

    mpath = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mpath):
        df, total = spark.read.parquet(path), None
        for c, (lo, hi) in predicates.items():
            df = df.filter(F.col(c).between(F.lit(lo), F.lit(hi)))
        return df, total, total
    with open(mpath) as f:
        manifest = json.load(f)
    keep = prune_files(manifest, predicates)
    # freshness: parquet files appended AFTER write_manifest have no stats —
    # they must be READ, not silently excluded (the same unknown-must-be-kept
    # rule prune_files applies per-column).  Re-applied filters below keep
    # the result exact.
    on_disk = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    unknown = [f for f in on_disk if f not in manifest]
    keep = sorted(set(keep) | set(unknown))
    total = len(manifest) + len(unknown)
    if not keep:
        # empty result with the right schema: read the schema-only view
        df = spark.read.parquet(path).limit(0)
        return df, 0, total
    df = spark.read.parquet(*[os.path.join(path, k) for k in keep])
    for c, (lo, hi) in predicates.items():
        df = df.filter(F.col(c).between(F.lit(lo), F.lit(hi)))
    return df, len(keep), total

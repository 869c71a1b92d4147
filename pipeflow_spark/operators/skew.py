"""Skew-aware two-phase aggregation (salting) for hot keys.

At 10^12-turn scale a Zipf-skewed ``conv_id`` concentrates whole partitions on
single keys; AQE's skew handling covers *joins*, not streaming/stateful
aggregation, so this is the custom piece (SURVEY.md §4.2.1): salt the key,
partial-aggregate per ``(key, salt)``, then merge per key.  Both phases are
map-side-combinable hash aggregates; the second shuffle moves only
``#keys × salts`` rows.

Supported merge algebra: count/sum/min/max are trivially re-aggregable; avg is
decomposed into (sum, count).  Arbitrary aggregators go through the same
pattern with ``applyInPandas`` partials.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Agg:
    """One aggregate: ``kind`` in {count, sum, min, max, avg}, source ``col``,
    output ``alias``."""

    kind: str
    col: str | None
    alias: str


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Agg],
    salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``salt_col``: column whose hash spreads a hot key's rows (default: a
    uniform random-ish hash of all columns via monotonically varying input —
    callers should pass a natural fine-grained column like ``turn_idx``).
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salts))
        if salt_col
        else F.pmod(F.xxhash64(F.rand(seed=42)), F.lit(salts))
    )

    partials: list[Column] = []
    finals: list[Column] = []
    for a in aggs:
        if a.kind == "count":
            partials.append(F.count("*").alias(f"__p_{a.alias}"))
            finals.append(F.sum(f"__p_{a.alias}").alias(a.alias))
        elif a.kind == "sum":
            partials.append(F.sum(a.col).alias(f"__p_{a.alias}"))
            finals.append(F.sum(f"__p_{a.alias}").alias(a.alias))
        elif a.kind == "min":
            partials.append(F.min(a.col).alias(f"__p_{a.alias}"))
            finals.append(F.min(f"__p_{a.alias}").alias(a.alias))
        elif a.kind == "max":
            partials.append(F.max(a.col).alias(f"__p_{a.alias}"))
            finals.append(F.max(f"__p_{a.alias}").alias(a.alias))
        elif a.kind == "avg":
            partials.append(F.sum(a.col).alias(f"__ps_{a.alias}"))
            partials.append(F.count(a.col).alias(f"__pc_{a.alias}"))
            finals.append(
                (F.sum(f"__ps_{a.alias}") / F.sum(f"__pc_{a.alias}")).alias(a.alias)
            )
        else:
            raise ValueError(f"unsupported agg kind {a.kind!r}")

    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def detect_hot_keys(df: DataFrame, keys: list[str], top_n: int = 20, sample_frac: float = 0.01) -> DataFrame:
    """Sampled hot-key report: approximate per-key row share from a Bernoulli
    sample (driver-side planning input for choosing salt counts)."""
    return (
        df.sample(fraction=sample_frac, seed=42)
        .groupBy(*keys)
        .agg(F.count("*").alias("sampled_rows"))
        .orderBy(F.col("sampled_rows").desc())
        .limit(top_n)
    )

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H-Q1-shaped pricing summary) on
sf0.001.  ``queries()`` / ``oracle_sql()`` — one entry per implemented
operator from SURVEY.md §2 plus the training-data extensions; definitions
live in :mod:`pipeflow_spark.queries` so the engine and the contract share
one registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from pipeflow_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["q1_pricing_summary"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL oracles.  minhash (recall-1 LSH config vs the exact
    Jaccard pair set), simhash (brute-force sketch twin), the sign-LSH
    ANN/kNN/embedding-dedup family (algorithm twins: same seed-42 planes as
    SQL literals), seven full streaming chains over the events table
    (committed exactly-once output ≡ batch SQL), and both multimodal decode
    queries (real stdlib BMP/WAV/AVI codecs vs closed-form generate_series
    twins) are oracle-checked, and both synthetic-transcript streaming e2e
    chains carry literal-pinned oracles (deterministic seed-42 generator →
    constant committed output, independently re-derived batch-side in
    tests/test_streaming.py); only HLL sketch values remain rows-only."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}

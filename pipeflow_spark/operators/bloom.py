"""Distributed Bloom filter — the membership primitive for decontamination
and anti-join pre-filters when the key set is too large to broadcast as an
exact hash set.

Where :mod:`.decontaminate` broadcasts the *exact* distinct eval-gram set
(8 bytes/gram plus JVM hash-relation overhead — fine for benchmark-sized
eval corpora), the Bloom path compresses the same membership test to
``m/8`` bytes total at a chosen false-positive rate (~1.2 GB for 10⁹ keys
at 1% FP), so it stays broadcastable even when the key side has grown far
past the exact-set comfort zone.  The corpus side is still a **map-only**
probe — the 100 TB scan never shuffles — and an optional exact verify join
over only the bloom survivors removes the false positives, making the
composed operator exact while shuffling ~(matches + FP·corpus-grams)
instead of the whole corpus.

Construction is distributed and JVM-side end to end:

* each key contributes ``k`` bit positions via double hashing
  ``pos_i = (h1 + i·h2) & (m-1)`` (Kirsch–Mitzenmacher), where ``h1`` is
  the key itself (already an ``xxhash64`` value) and ``h2 = xxhash64(h1,
  1)`` — both computed by codegen, never in Python;
* positions fold to ``(word = pos >> 6, mask = 1 << (pos & 63))`` and a
  single ``groupBy(word).agg(bit_or(mask))`` shuffle of 16-byte rows
  builds the sparse word map; the driver materializes the dense
  ``m/64``-long array once and broadcasts it.

``m`` must be a power of two: the probe kernel runs in numpy ``uint64``
while the JVM computes signed 64-bit arithmetic, and the two agree on
``x mod m`` exactly when ``m`` divides 2⁶⁴ (two's-complement wraparound is
the same bit pattern; a non-power-of-two modulus would diverge on
"negative" hashes).

Reference analog: none — PipeFlow has no sketch surface; this extends the
training-data extension mandate (SURVEY §2.8) alongside MinHash/SimHash.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .dedupe import gram_hash_posting


def optimal_params(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(m, k) sized for ``n_keys`` at ``fp_rate``, with ``m`` rounded UP to
    a power of two (required — see module docstring) so the realized FP
    rate is ≤ the requested one."""
    if n_keys <= 0:
        return 64, 1
    m_exact = -n_keys * math.log(fp_rate) / (math.log(2) ** 2)
    m = 1 << max(6, math.ceil(math.log2(m_exact)))
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _hash2(col):
    """Second, independent 64-bit hash of an already-hashed long key."""
    return F.xxhash64(col, F.lit(1))


def build_bloom(keys: DataFrame, key_col: str, m: int, k: int) -> np.ndarray:
    """Distributed build → dense ``uint64[m/64]`` bitset on the driver.

    ``keys[key_col]`` must be 64-bit hashes (``xxhash64`` output).  One
    narrow shuffle: explode to ``k`` positions per key (16-byte rows),
    ``bit_or`` per word.  Only words with ≥1 set bit come back (≤ k·|keys|
    rows, typically ≪ m/64 for sparse fills)."""
    if m & (m - 1):
        raise ValueError("m must be a power of two")
    # Reduce mod m BEFORE the multiply-add: (h1 + i·h2) mod m ≡
    # ((h1 mod m) + i·(h2 mod m)) mod m (ring homomorphism, and for signed
    # two's-complement x, x & (m-1) IS x mod m when m divides 2⁶⁴).  The
    # reduced operands are < m, so i·h2m + h1m ≤ k·m never overflows a
    # signed long — required under ANSI mode, and exactly what the numpy
    # probe's uint64 wraparound computes.
    mm = F.lit(m - 1).cast("long")
    h1m = F.col(key_col).bitwiseAND(mm)
    h2m = _hash2(key_col).bitwiseAND(mm)
    probes = F.array(*[
        (h1m + F.lit(i).cast("long") * h2m).bitwiseAND(mm) for i in range(k)
    ])
    words = (
        keys.select(F.explode(probes).alias("pos"))
        .select(
            F.shiftrightunsigned("pos", 6).alias("word"),
            F.expr("shiftleft(1L, CAST(pos & 63 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    dense = np.zeros(m >> 6, dtype=np.uint64)
    for r in words:
        dense[r.word] = np.uint64(r.bits & 0xFFFFFFFFFFFFFFFF)
    return dense


def might_contain_udf(spark: SparkSession, bits: np.ndarray, m: int, k: int):
    """Arrow-vectorized probe ``(h1, h2) → bool`` over the broadcast bitset.

    Probing takes the JVM-computed ``h2`` as a second column rather than
    re-implementing xxhash64 in Python — build and probe hash identically
    by construction."""
    bc = spark.sparkContext.broadcast(bits)
    mask = np.uint64(m - 1)

    @pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        w = bc.value
        a = h1.to_numpy(dtype=np.int64).view(np.uint64)
        b = h2.to_numpy(dtype=np.int64).view(np.uint64)
        hit = np.ones(len(a), dtype=bool)
        for i in range(k):
            pos = (a + np.uint64(i) * b) & mask
            hit &= (w[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return pd.Series(hit)

    return probe


def contaminated_docs_bloom(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    fp_rate: float = 0.01,
    exact: bool = True,
) -> DataFrame:
    """Bloom-pre-filtered twin of
    :func:`pipeflow_spark.operators.decontaminate.contaminated_docs` —
    identical output when ``exact=True`` (the default), reached without
    ever broadcasting the exact eval-gram set:

    1. eval grams → 64-bit hashes → distributed Bloom build;
    2. corpus gram posting probes the broadcast bitset **map-only**;
    3. only bloom survivors (true matches + FP·corpus fraction) enter the
       exact semi-join against the eval hashes — sized by AQE at runtime,
       never force-broadcast;
    4. per-doc ``count(*)`` as before.

    ``exact=False`` skips step 3: output is a deterministic superset
    (every truly contaminated doc present, plus ≤ fp_rate of the rest) —
    the audit-mode shape for when even the survivor join must be avoided.
    """
    from ..session import spread

    spark = train_df.sparkSession
    ev = gram_hash_posting(spread(eval_df), text_col, id_col, n=n).select("gh").distinct()
    n_keys = ev.count()
    m, k = optimal_params(n_keys, fp_rate)
    bits = build_bloom(ev, "gh", m, k)
    probe = might_contain_udf(spark, bits, m, k)

    posting = (
        gram_hash_posting(spread(train_df), text_col, id_col, n=n)
        .select(F.col("id").alias(id_col), "gh")
        .withColumn("gh2", _hash2("gh"))
    )
    survivors = posting.filter(probe("gh", "gh2")).drop("gh2")
    if exact:
        survivors = survivors.join(ev, "gh", "left_semi")
    return survivors.groupBy(id_col).agg(F.count("*").alias("shared_grams"))


def decontaminate_bloom(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    fp_rate: float = 0.01,
) -> DataFrame:
    """Filtering form: training docs with zero eval overlap (exact — bloom
    only pre-filters; the anti-join key set is the verified id list)."""
    bad = contaminated_docs_bloom(
        train_df, eval_df, text_col, id_col, n=n, fp_rate=fp_rate, exact=True
    ).select(id_col)
    return train_df.join(bad, id_col, "left_anti")

"""Deduplication family for web-scale corpora.

Four tiers, cheapest first:

1. :func:`exact` — hash-groupBy on a normalized fingerprint (one shuffle,
   map-side partial agg; the 100 TB default).
2. :func:`ngram_jaccard_pairs` — exact n-gram Jaccard via an inverted-index
   self-join (posting-list equi-join, never all-pairs).
3. :func:`minhash_lsh_pairs` — MinHash signatures + banded LSH bucketing, the
   sub-quadratic near-dup path; candidates verified with true Jaccard.
4. :func:`simhash` — 64-bit SimHash sketch (vectorized numpy pandas_udf).

Reference analog: PipeFlow only has whole-row ``Distinct`` and first-wins
``RemoveDuplicates(key)`` (``PipeFlow/Pipeline.cs:80-84``,
``PipeFlow/PipeFlow.cs:218-232``); near-dup detection is part of the
training-data extension surface.

Scale notes: every join here is an equi-join on a hash bucket (shuffle
hash-partitionable, AQE-skew-splittable); signatures are fixed-width arrays so
shuffle width is bounded; nothing collects to the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import fingerprint, normalize_text

# -- 1. exact ---------------------------------------------------------------


def exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedupe: one survivor (min id) per normalized-text fingerprint.

    Returns ``(doc_id, fp, dup_count)``.  Single hash-shuffle on the 128-bit
    fingerprint → uniform key distribution, no skew handling needed.
    """
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .select(id_col, "fp", "dup_count")
    )


# -- shared: word n-gram shingles (pure Column algebra) ----------------------


def word_ngrams(text_col, n: int = 3):
    """Distinct word ``n``-grams of the normalized text as ``array<string>``.
    ``sequence → transform(slice → concat_ws) → array_distinct`` — JVM-side."""
    toks = F.split(normalize_text(text_col), r"\s+")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(grams)


# -- 2. exact n-gram Jaccard via inverted index -------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All pairs with n-gram Jaccard ≥ threshold, via posting-list self-join.

    Plan shape (the scalable one): explode grams → self-equi-join on gram
    (co-partitioned shuffle join; only docs *sharing* a gram ever meet) →
    per-pair intersection count → join per-doc set sizes → Jaccard filter.
    Never materializes the |docs|² cross product.
    """
    grams = df.select(
        F.col(id_col).alias("id"), word_ngrams(F.col(text_col), n).alias("grams")
    ).withColumn("n_grams", F.size("grams"))
    sizes = grams.select("id", "n_grams")
    posting = grams.select("id", F.explode("grams").alias("gram"))
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -- 3. MinHash + banded LSH ---------------------------------------------------


def minhash_signature(grams_col, num_hashes: int = 64):
    """``num_hashes`` min-hash values as ``array<bigint>``.

    Hash family: ``xxhash64(gram, seed_i)`` — k independent 64-bit families
    evaluated entirely in codegen (``transform`` + ``array_min`` per seed, no
    Python).

    NB: the per-seed lambda must stay single-parameter — PySpark interprets a
    two-parameter higher-order-function lambda as ``(element, index)``.
    """

    def hasher(seed: int):
        return lambda g: F.xxhash64(g, F.lit(seed))

    return F.array(
        *[F.array_min(F.transform(grams_col, hasher(seed))) for seed in range(num_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, verified with true
    Jaccard.

    rows = bands × r; a pair collides if any band signature matches —
    P(candidate) = 1 − (1 − j^r)^bands.  With 64/16 (r=4) the S-curve centers
    near j ≈ 0.5.  Candidates are then *verified* against the exact n-gram
    Jaccard, so output has no false positives.

    Scale: signature is 64×8 bytes/doc; band keys hash-shuffle uniformly; the
    bucket self-join only pairs docs sharing a band signature.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    grams = df.select(
        F.col(id_col).alias("id"), word_ngrams(F.col(text_col), n).alias("grams")
    )
    sig = grams.select("id", "grams", minhash_signature(F.col("grams"), num_hashes).alias("sig"))
    # band key = (band_idx, hash of the band's slice of the signature)
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.xxhash64(F.concat_ws(",", F.slice("sig", bi * r + 1, r)), bi).alias("bkey"),
                ),
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bkey")
    x, y = banded.alias("x"), banded.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    ga = grams.select(F.col("id").alias("id_a"), F.col("grams").alias("grams_a"))
    gb = grams.select(F.col("id").alias("id_b"), F.col("grams").alias("grams_b"))
    return (
        candidates.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("grams_a", "grams_b"))
                / F.size(F.array_union("grams_a", "grams_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -- 4. SimHash ----------------------------------------------------------------

_SIMHASH_SCHEMA = T.LongType()


@F.pandas_udf(_SIMHASH_SCHEMA)
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens — vectorized numpy inside an
    Arrow batch (the designated slow-path mechanism; no per-row Python at the
    Spark layer).  Token hash: first 8 bytes of md5 (stable across platforms,
    unlike Python's builtin ``hash``)."""
    import hashlib

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = ("" if t is None else str(t)).lower().split()
        if not toks:
            continue
        hs = np.fromiter(
            (int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big") for tok in set(toks)),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        acc = (2 * bits - 1).sum(axis=0)
        out[i] = np.int64(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum().astype(np.uint64).view(np.int64))
    return pd.Series(out)


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole blocking: split the 64-bit sketch into ``blocks`` 16-bit blocks;
    any pair within distance ``max_hamming < blocks`` agrees on ≥1 block →
    equi-join on (block_idx, block_value), then verify the true Hamming
    distance with ``bit_count(xor)`` JVM-side.
    """
    from ..session import ensure_shipped

    ensure_shipped(df.sparkSession)  # pandas_udf below needs the package on workers
    width = 64 // blocks
    sk = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sk"))
    mask = (1 << width) - 1
    blocked = sk.select(
        "id",
        "sk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("blk"),
                        F.shiftrightunsigned("sk", bi * width).bitwiseAND(F.lit(mask)).alias("bval"),
                    )
                    for bi in range(blocks)
                ]
            )
        ).alias("b"),
    ).select("id", "sk", "b.blk", "b.bval")
    x, y = blocked.alias("x"), blocked.alias("y")
    return (
        x.join(
            y,
            (F.col("x.blk") == F.col("y.blk"))
            & (F.col("x.bval") == F.col("y.bval"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.bit_count(F.col("x.sk").bitwiseXOR(F.col("y.sk"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )

"""N-gram language-model perplexity scoring — the CCNet-recipe quality
filter for pretraining corpora (Wenzek et al., "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data", LREC 2020): train a small
LM on a trusted reference slice, score every candidate document by
cross-entropy under it, and keep the low-perplexity (reference-like) tail.
The production recipe uses a KenLM 5-gram; this operator is the exact,
SQL-oracle-able core of it — an add-k smoothed **bigram** LM — which already
separates fluent text from boilerplate/noise far better than the unigram
floor (`text.unigram_quality`) because it scores token *transitions*.

Reference surface analog: the Filter/Transform quality stages of the
pipeline (``PipeFlow/PipeFlow.cs:25-191`` fluent chain); the reference has
no statistical scorer — this is part of the training-data extension family
(SURVEY.md §2, LLM-data-pipeline operators).

Model: for bigram (w, v),  P(v|w) = (C(w,v) + k) / (C(w) + k·V)  where
C(·) are counts over the TRAINING slice, C(w) = Σ_v C(w,v) (so the
conditional normalizes exactly), V = |training vocabulary|, k = add-k
smoothing mass.  Unseen contexts and OOV transitions degrade smoothly to
≈ 1/V instead of −∞.  Document score = mean over its bigrams of
−ln P(v|w) (cross-entropy, nats); perplexity = exp(score) is monotone in
it, so filtering thresholds on the cross-entropy directly.

Scale shape (100 TB posture):
* tokenize + bigram fan-out are MAP-ONLY (each row zips its own token
  array with its tail — no positional shuffle, and the same expression is
  legal on a streaming DataFrame, which is what the streaming perplexity
  gate rides);
* the model tables are VOCABULARY-sized, not corpus-sized: bigram counts
  (one hash shuffle on (w, v)), context counts derived from them (one
  vocab-sized shuffle on w), V a 1-row aggregate.  Zipf makes both tables
  ≪ token stream; Catalyst/AQE broadcast them when they fit and
  shuffle-join otherwise — either way the scoring join never carries more
  than the candidate bigram stream;
* nothing vocabulary- or corpus-sized ever reaches the driver.

Determinism/oracle parity: tokenization is the shared
``split(trim(lower(text)), '\\s+')`` rule; scores are
``round(avg(ln ...), 5)`` — the same 5-dp float-sum envelope the certified
`unigram_quality` oracle pins (ln/avg are IEEE-double in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def bigram_pairs_col(text_col: str):
    """``array<struct<w,v>>`` of consecutive token pairs, computed per ROW
    (zip the token array with its own tail) — MAP-ONLY, no shuffle, and
    therefore legal on a streaming DataFrame too (a window ``lead`` over
    positions would neither avoid the shuffle nor run on a stream).  A
    document with < 2 tokens yields an empty array; the '' phantom token of
    an empty document can never pair (its array has size 1)."""
    a = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(a)
    return F.arrays_zip(
        F.slice(a, 1, n - 1).alias("w"), F.slice(a, 2, n - 1).alias("v")
    )


def bigrams(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, w, v) — consecutive token pairs per document, map-only fan-out
    (see :func:`bigram_pairs_col`); documents with < 2 tokens contribute no
    rows."""
    from ..session import spread

    return (
        spread(df)
        .select(id_col, F.explode(bigram_pairs_col(text_col)).alias("p"))
        .select(id_col, F.col("p.w").alias("w"), F.col("p.v").alias("v"))
        .filter((F.col("w") != "") & (F.col("v") != ""))
    )


def train_bigram_lm(
    train: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables of the add-k LM: ``(bi, uni, vocab)`` where
    ``bi = (w, v, cwv)``, ``uni = (w, cw)`` with ``cw = Σ_v cwv`` (exact
    conditional normalization), and ``vocab`` a 1-row ``(lm_v)`` distinct
    token count.  All three are plain DataFrames — persist/write them to
    reuse one trained model across scoring runs."""
    bi = (
        bigrams(train, text_col, id_col)
        .groupBy("w", "v")
        .agg(F.count("*").cast("double").alias("cwv"))
    )
    uni = bi.groupBy("w").agg(F.sum("cwv").alias("cw"))
    vocab = (
        tokens(train, text_col, id_col)
        .agg(F.countDistinct("token").cast("double").alias("lm_v"))
    )
    return bi, uni, vocab


def lm_cross_entropy(
    docs: DataFrame,
    train: DataFrame,
    add_k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    ndigits: int = 5,
) -> DataFrame:
    """Score every document in ``docs`` under a bigram LM trained on
    ``train``: returns ``(id_col, n_bigrams, xent)`` — bigram count and
    mean −ln P(v|w) rounded to ``ndigits`` — for every document with at
    least one bigram, ordered by id.  Lower xent = more reference-like;
    CCNet keeps the head/middle of this ranking and drops the tail."""
    bi, uni, vocab = train_bigram_lm(train, text_col, id_col)
    cand = bigrams(docs, text_col, id_col)
    scored = (
        cand.join(bi, ["w", "v"], "left")
        .join(uni, ["w"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            # −ln P = ln(cw + k·V) − ln(cwv + k); coalesce(0) = unseen
            (
                F.log(F.coalesce(F.col("cw"), F.lit(0.0)) + add_k * F.col("lm_v"))
                - F.log(F.coalesce(F.col("cwv"), F.lit(0.0)) + F.lit(add_k))
            ).alias("nll"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("nll"), ndigits).alias("xent"),
        )
        .orderBy(id_col)
    )

"""Hybrid retrieval: reciprocal-rank fusion of lexical (BM25) and vector
(cosine) rankings — the standard RAG-retrieval composite on top of
``text.bm25_topk`` and ``similarity.cosine_topk``.

No reference analog (PipeFlow has no search ops) — training-data extension
surface (SURVEY §2.8).  RRF (Cormack et al., SIGIR 2009):
``score(d) = Σ_lists 1 / (k_rrf + rank_list(d))`` — rank-only fusion, so the
incomparable BM25 and cosine score scales never need calibration.

Scale shape: each leg's top-``depth`` candidate set is O(depth) rows — the
corpus-sized work happens inside the legs (BM25's one tf shuffle, cosine's
TakeOrderedAndProject scan); fusion itself joins two ≤depth-row lists, so the
single-partition rank windows here are windows over *constants*, not data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import similarity
from .text import bm25_topk


def add_rank(df: DataFrame, score_col: str, id_col: str, depth: int) -> DataFrame:
    """Dense 1-based rank by (score desc, id asc), cut to top-``depth``.

    Deterministic cross-engine iff ``score_col`` is already rounded (both
    legs round to 6 digits).  The unpartitioned window is safe by contract:
    callers pass candidate lists already limited to O(depth) rows.
    """
    w = Window.orderBy(F.desc(score_col), F.col(id_col))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= depth)
        .select(id_col, "rank")
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    ndigits: int = 6,
) -> DataFrame:
    """Fuse ranked lists (``(id_col, rank)`` each) by reciprocal-rank sum.

    Returns ``(id_col, n_lists, rrf_score)`` — top-``k`` by fused score with
    an id tie-break; ``n_lists`` = how many legs retrieved the doc.  Scores
    are rounded before the cut so the selection is a cross-engine total
    order (same trick as :func:`..text.bm25_topk`).
    """
    contribs = [
        df.select(
            F.col(id_col), (F.lit(1.0) / (k_rrf + F.col("rank"))).alias("_c")
        )
        for df in ranked
    ]
    return (
        reduce(DataFrame.unionByName, contribs)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_lists"),
            F.round(F.sum("_c"), ndigits).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), id_col)
        .limit(k)
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    k: int = 10,
    depth: int = 50,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """BM25 ∪ cosine hybrid search: run both legs to ``depth`` candidates,
    rank each, RRF-fuse, return the top-``k`` ``(doc_id, n_lists,
    rrf_score)``.  Assumes ``embeddings.vec_id`` keys the same corpus as
    ``docs.doc_id`` (the testdata contract)."""
    lex = add_rank(
        bm25_topk(docs, query_terms, k=depth, id_col=id_col),
        "score",
        id_col,
        depth,
    )
    vec = add_rank(
        similarity.cosine_topk(embeddings, query_vec, k=depth, id_col=vec_id_col)
        .withColumnRenamed(vec_id_col, id_col),
        "sim",
        id_col,
        depth,
    )
    return rrf_fuse([lex, vec], k=k, k_rrf=k_rrf, id_col=id_col)

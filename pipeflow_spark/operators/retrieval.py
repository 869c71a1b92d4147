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


def mmr_rerank(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    depth: int = 50,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
    1998): greedily pick ``k`` of the top-``depth`` cosine candidates,
    maximizing ``lam·rel(d) − (1−lam)·max_{s∈S} sim(d, s)`` — relevance
    traded against redundancy with what's already selected.

    Scale shape: the corpus-sized work is the candidate generation
    (``similarity.cosine_topk`` — scan + TakeOrderedAndProject, no shuffle);
    the greedy selection is inherently sequential over O(depth²) *rounded*
    pairwise sims, so it runs driver-side on the collected ≤depth candidate
    rows (the same bounded-collect contract as IVF centroid training,
    ``similarity.py:263``).  Every intermediate (rel, pairwise sim, step
    score) is rounded to ``ndigits`` with an id tie-break, making the
    selection a cross-engine total order — the DuckDB twin is a recursive
    CTE running the identical greedy (``mmr_diverse_topk`` in queries.py).

    Returns ``(id_col, rank, score)``: rank 1 = highest relevance; each
    later score is that step's marginal objective.
    """
    import math

    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    cand_df = (
        emb.select(
            F.col(id_col),
            v.alias("_v"),
            F.round(similarity.cosine(v, q), ndigits).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col(id_col))
        .limit(depth)  # TakeOrderedAndProject: O(depth) memory per partition
    )
    cands = [
        (r[0], [float(x) for x in r[1]], float(r[2])) for r in cand_df.collect()
    ]

    def cos(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        return round(num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))), ndigits)

    picked: list[tuple] = []  # (id, rank, score)
    picked_vecs: list[list[float]] = []
    remaining = {i: (vid, v, rel) for i, (vid, v, rel) in enumerate(cands)}
    while remaining and len(picked) < k:
        best = None
        for i, (vid, v, rel) in remaining.items():
            if not picked:
                score = rel
            else:
                score = round(
                    lam * rel - (1 - lam) * max(cos(v, s) for s in picked_vecs), ndigits
                )
            key = (-score, vid)
            if best is None or key < best[0]:
                best = (key, i, vid, v, score)
        _, i, vid, v, score = best
        picked.append((vid, len(picked) + 1, score))
        picked_vecs.append(v)
        del remaining[i]

    spark = emb.sparkSession
    # id type follows the input column (string/int ids are legal — nothing
    # in the greedy needs numeric ids), never a hardcoded long
    id_type = emb.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(picked, f"{id_col} {id_type}, rank int, score double")

"""Domain-graph centrality: PageRank over the cross-source syndication graph.

Reference analog: none — PipeFlow has no graph ops; this is training-data
curation surface (SURVEY §2.8).  Web-corpus pipelines weight documents by the
centrality of their *domain* in a link/syndication graph (the CommonCrawl
domain-ranking step); here the graph is derived from the corpus itself:
source A ↔ source B are linked when they publish the same *rare* content
spans (shared low-document-frequency n-grams), i.e. a syndication/mirroring
edge.

Determinism contract (oracle = unrolled fixed-K iterations in DuckDB SQL):
ranks are kept as **integer-scaled** values (``SCALE = 10^12``) and every
per-iteration operation is exact int64 arithmetic — contribution is
``rank*w DIV out_w`` (int64 floor division), damping is ``*17 DIV 20``
(0.85 as a ratio), teleport is ``0.15*SCALE DIV n_nodes``.  Integer sums are
order-independent, so Spark and DuckDB produce bit-identical ranks at every
iteration — no float-summation-order hazard, no rounding cliff.

Scale shape (100 TB corpus, ~10^7 domains):
* The linkage signal is **shared rare word n-grams**: sources A and B are
  linked with weight = number of distinct n-grams that (a) both publish and
  (b) appear in only [min_df, max_df] docs corpus-wide.  The df band is the
  boilerplate guard built into the definition — a gram shared by every
  domain (nav chrome, licence text) is excluded by ``max_df``, so the
  per-gram self-join fanout is bounded at ``max_df²`` pairs by construction
  (the same bucket-cap posture as ``similarity.knn_blocked``).
* Grams travel as 8-byte ``xxhash64`` longs via ``dedupe.gram_hash_posting``
  (never strings); the oracle rebuilds the identical weights from string
  grams, so a green row also re-proves the long path collision-exact — the
  same twin pairing ``dup_span_profile`` certifies.
* Each PageRank iteration is one join keyed on edge source + one groupBy on
  edge destination — the canonical distributed PR step; state between
  iterations is one (node, rank) row per domain.  Lineage is flattened per
  iteration (``localCheckpoint`` locally; callers on real clusters pass
  ``reliable=True`` for a checkpoint-dir-backed cut, same contract as
  ``dedupe.connected_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedupe import _ckpt, gram_hash_posting

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 17, 20  # 0.85 as an exact ratio
# rank_scaled * w must stay inside int64: rank_scaled <= SCALE (=1e12), so
# edge weights are capped at 4e6 (1e12 * 4e6 = 4e18 < 2^63-1).  The cap is
# part of the operator's semantics (mirrored in the SQL oracle), not a
# silent clamp: a pair of domains sharing >4M rare grams is "maximally
# syndicated" for ranking purposes.
MAX_WEIGHT = 4_000_000


def syndication_edges(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
    n: int = 3,
    min_df: int = 2,
    max_df: int = 8,
    max_weight: int = MAX_WEIGHT,
) -> DataFrame:
    """Weighted directed edge list ``(s, d, w)`` between sources sharing
    rare content spans: ``w`` = count of distinct word ``n``-grams with
    corpus document frequency in ``[min_df, max_df]`` that both sources
    contain (capped at ``max_weight`` — the :data:`MAX_WEIGHT` int64-overflow
    guard), symmetrized (every undirected pair appears in both
    directions)."""
    posting = gram_hash_posting(docs, text_col, id_col, n)
    freq = (
        posting.groupBy("gh")
        .agg(F.count("*").alias("nd"))
        .filter((F.col("nd") >= min_df) & (F.col("nd") <= max_df))
    )
    src = docs.select(F.col(id_col).alias("id"), F.col(source_col).alias("src"))
    rare_src = (
        posting.join(freq.select("gh"), "gh").join(src, "id").select("src", "gh").distinct()
    )
    a, b = rare_src.alias("a"), rare_src.alias("b")
    half = (
        a.join(b, "gh")
        .filter(F.col("a.src") < F.col("b.src"))
        .groupBy(F.col("a.src").alias("s"), F.col("b.src").alias("d"))
        .agg(F.least(F.count("*"), F.lit(max_weight)).alias("w"))
    )
    return half.unionByName(half.select(F.col("d").alias("s"), F.col("s").alias("d"), "w"))


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-``iterations`` weighted PageRank in exact int64 arithmetic.

    ``nodes`` = one column ``node`` (all vertices, isolated ones included);
    ``edges`` = ``(s, d, w)`` directed weighted.  Returns ``(node,
    rank_scaled)`` where ``rank_scaled`` is the integer 10^12-scaled rank.

    Update rule (all int64, order-independent):
      ``r'(v) = (0.15*SCALE div N) + (17 * Σ_{(u,v)} (r(u)*w div outw(u))) div 20``
    Dangling mass is dropped (symmetric syndication edges have none; isolated
    nodes hold the teleport floor).  Weights are clamped to
    :data:`MAX_WEIGHT` so ``rank*w`` can never leave int64 (ANSI-mode
    overflow / silent wrap guard).

    ``nodes``/``edges``/``out_w`` are materialized once up front — without
    that, every iteration would re-execute the caller's full edge-derivation
    lineage (for :func:`syndication_edges`, the gram self-join) per round.
    """
    if reliable and checkpoint_dir is not None:
        nodes.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    edges = _ckpt(edges.withColumn("w", F.least(F.col("w"), F.lit(MAX_WEIGHT))), reliable)
    nodes = _ckpt(nodes, reliable)
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_scaled"))
    teleport = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN // n_nodes
    out_w = _ckpt(edges.groupBy("s").agg(F.sum("w").alias("ow")), reliable)
    ranks = nodes.select("node", F.lit(SCALE // n_nodes).cast("long").alias("rank_scaled"))
    for _ in range(iterations):
        contrib = (
            edges.join(out_w, "s")
            .join(ranks, F.col("s") == F.col("node"))
            .select(
                F.col("d"),
                F.expr("div(rank_scaled * w, ow)").cast("long").alias("c"),
            )
            .groupBy("d")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["d"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(f"div({DAMP_NUM} * coalesce(in_sum, 0), {DAMP_DEN})")
                ).cast("long").alias("rank_scaled"),
            )
        )
        ranks = _ckpt(ranks, reliable)
    return ranks


def domain_rank(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
    iterations: int = 5,
    n: int = 3,
    min_df: int = 2,
    max_df: int = 8,
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """End-to-end: corpus → syndication graph → PageRank per source.

    Returns ``(source, rank_scaled, pagerank)`` — ``rank_scaled`` the exact
    int64 10^12-scaled rank (bit-identical across engines), ``pagerank`` the
    human-readable float (a single deterministic division per row)."""
    nodes = docs.select(F.col(source_col).alias("node")).distinct()
    edges = syndication_edges(
        docs, text_col, source_col, id_col=id_col, n=n, min_df=min_df, max_df=max_df
    )
    ranked = pagerank(
        nodes, edges, iterations=iterations, reliable=reliable, checkpoint_dir=checkpoint_dir
    )
    return ranked.select(
        F.col("node").alias("source"),
        "rank_scaled",
        F.round(F.col("rank_scaled") / F.lit(float(SCALE)), 9).alias("pagerank"),
    )

"""BPE tokenizer induction: learn merge rules from the corpus, distributed.

Reference analog: none — PipeFlow has no tokenizer ops; this is training-data
surface (SURVEY §2.8): before pretraining you *induce* the tokenizer from the
corpus (Sennrich et al., ACL 2016 byte-pair encoding).  Each merge step picks
the globally most frequent adjacent symbol pair and fuses it everywhere.

Algorithm shape (the standard distributed formulation):
1. One corpus pass → **word-frequency table** (vocab): all later iterations
   run over the vocab, whose size is ~10^6–10^8 rows regardless of corpus
   size — the 100 TB corpus is touched exactly once.
2. Each word's symbol sequence is kept as a delimited string ``|h||e||y|``
   (every token wrapped in ``|``; words are lowercased a–z so the delimiter
   can never collide).  Applying merge (a,b) is then exactly
   ``replace(seq, '|a||b|', '|ab|')`` — SQL/Spark ``replace`` scans
   left-to-right non-overlapping, which IS the BPE merge order, and the
   wrapped representation makes adjacent matches (``abab``) safe because no
   delimiter character is shared between consecutive matches.
3. Per iteration: explode adjacent pairs from each vocab row (weighted by
   word count), one vocab-sized groupBy, and a **single argmax row** to the
   driver (that one row is the learned rule — driver traffic is O(k_merges),
   not data-sized).  Ties break on (pair) lexicographic so Spark and the
   DuckDB oracle pick the identical rule.

Determinism: counts are exact int64, the argmax total order is
(count DESC, left, right), and ``replace`` semantics agree between engines —
the learned merge table is bit-identical, which is what the unrolled-SQL
oracle checks.

Scale notes: lineage is cut per iteration (localCheckpoint locally,
``reliable=True`` → checkpoint-dir on real clusters, same contract as
``dedupe.connected_components``).  For production-sized merge counts (32k+)
you batch: re-count only pairs overlapping the last merge (the classic
incremental-BPE refinement) — out of scope here; the per-iteration plan shape
is already the scalable one (vocab-sized shuffle, constant driver traffic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedupe import _ckpt

WORD_RE = "[a-z]+"
TOKEN_RE = r"\|([^|]+)\|"
# Inside an F.expr SQL string literal, backslashes are escape chars — the
# pattern needs them doubled or the regex degrades to empty alternation.
TOKEN_RE_SQL = r"\\|([^|]+)\\|"


def word_vocab(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 2,
    max_len: int = 20,
) -> DataFrame:
    """Corpus → ``(seq, cnt)`` word-frequency table.  ``seq`` is the wrapped
    symbol sequence (one char per symbol initially); words outside
    [min_len, max_len] are dropped (cap bounds the per-row pair fanout)."""
    words = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
            ).alias("w")
        )
        .filter((F.length("w") >= min_len) & (F.length("w") <= max_len))
    )
    return (
        words.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.concat(
                F.lit("|"), F.expr("array_join(split(w, ''), '||')"), F.lit("|")
            ).alias("seq"),
            "cnt",
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair totals from the wrapped sequences, weighted by word
    count.  Overlapping positions all count (Sennrich counting); the merge
    application is the non-overlapping left-to-right pass."""
    toks = vocab.select(
        F.expr(f"regexp_extract_all(seq, '{TOKEN_RE_SQL}', 1)").alias("t"), "cnt"
    ).filter(F.size("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i-1] as a, t[i] as b))"
            )
        ).alias("p"),
        "cnt",
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("cnt").alias("total")
    )


def learn_merges(
    docs: DataFrame,
    text_col: str = "text",
    k_merges: int = 6,
    min_len: int = 2,
    max_len: int = 20,
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Learn ``k_merges`` BPE rules; returns ``(step, lhs, rhs, merged,
    pair_count)`` — the merge table a tokenizer would serialize.  One corpus
    pass, then ``k_merges`` vocab-sized jobs with a 1-row driver collect
    each."""
    spark = docs.sparkSession
    if reliable and checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    vocab = word_vocab(docs, text_col, min_len, max_len)
    vocab = _ckpt(vocab, reliable)
    rules: list[tuple[int, str, str, str, int]] = []
    for step in range(1, k_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("total"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, total = top[0]["a"], top[0]["b"], int(top[0]["total"])
        rules.append((step, a, b, a + b, total))
        vocab = vocab.select(
            F.expr(f"replace(seq, '|{a}||{b}|', '|{a}{b}|')").alias("seq"), "cnt"
        )
        vocab = _ckpt(vocab, reliable)
    return spark.createDataFrame(
        rules, "step int, lhs string, rhs string, merged string, pair_count bigint"
    )


def apply_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize the corpus with a learned rule list: per word, wrap to the
    ``|c||c|`` form and run the merges in order — pure JVM string ops chained
    by Catalyst, map-only (no shuffle, no Python)."""
    seq = F.concat(
        F.lit("|"), F.expr(f"array_join(split(lower({text_col}), ''), '||')"), F.lit("|")
    )
    for a, b in merges:
        seq = F.replace(seq, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
    return docs.withColumn(
        out_col, F.regexp_extract_all(seq, F.lit(TOKEN_RE), F.lit(1))
    )

"""Conversation prefix-tree analytics: how often do transcripts share a
prefix and then diverge?

Agent systems replay/resample conversations: N runs share the turns up to
some depth, then branch (different tool choice, different sampled reply).
The shape of that tree — how many distinct prefixes exist at each depth, how
many of them branch, how wide the widest branch point is — is the standard
health view of a resampling pipeline (degenerate = every conv unique from
turn 1; collapsed = everything identical to depth 20).  PipeFlow has no
transcript surface at all (nearest: ``GroupBy``, ``PipeFlow/Pipeline.cs:
86-97``); training-data extension surface, transcripts payload.

Scale shape: one shuffle to assemble each conversation's ordered turn-label
array (conversations are bounded-length — tens of turns — so the per-conv
array is small), then a map-side explode of its ``len-1`` prefixes and ONE
hash aggregate keyed on ``(depth, prefix)``.  Prefix keys here are the raw
joined strings so the DuckDB oracle matches byte-for-byte; at corpus scale
swap the group key for ``xxhash64`` of the same string (the output only
carries per-depth counts, never the key, so the swap is invisible modulo
hash collisions).  Work is Σ conv_len² per conversation — quadratic only in
the bounded turn count, linear in conversations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["prefix_branching", "prefix_rows_from_transcript", "branching_report"]


def prefix_branching(
    turns: DataFrame,
    conv_cols: str | list[str],
    label_col: str,
    order_cols: list[str],
    sep: str = ">",
) -> DataFrame:
    """Per prefix depth ``d``: how many distinct ``d``-turn prefixes have a
    continuation, how many of those branch (≥2 distinct next turns), the
    widest fan-out, and how many continuations were observed in total.

    ``turns``: one row per turn; ``conv_cols`` identify a conversation,
    ``order_cols`` order turns within it, ``label_col`` is the turn label
    compared for prefix equality (an event type, a role, a text
    fingerprint).

    Output ``(depth, n_prefixes, n_branching, max_fanout, n_next_turns)``
    ordered by depth.
    """
    convs = [conv_cols] if isinstance(conv_cols, str) else list(conv_cols)
    labels = (
        turns.groupBy(*convs)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(*order_cols, F.col(label_col).alias("__l")))
            ).alias("__ord")
        )
        .select(F.transform("__ord", lambda s: s["__l"]).alias("__labels"))
    )
    return branching_report(_explode_prefixes(labels, sep))


def _explode_prefixes(labels: DataFrame, sep: str) -> DataFrame:
    """``(depth, prefix, cont)`` from a ``__labels`` array column — single
    home for the explode (batch turns path and stream transcript path).
    Guards the single-turn conv: ``sequence(1, 0)`` would generate
    DESCENDING ``[1, 0]``, not an empty list — explode an empty array
    instead."""
    depths = F.when(
        F.size("__labels") > 1, F.sequence(F.lit(1), F.size("__labels") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return labels.select(
        F.explode(
            F.transform(
                depths,
                lambda d: F.struct(
                    d.alias("depth"),
                    F.array_join(F.slice("__labels", 1, d), sep).alias("prefix"),
                    F.get("__labels", d).alias("cont"),
                ),
            )
        ).alias("p")
    ).select("p.depth", "p.prefix", "p.cont")


def prefix_rows_from_transcript(
    df: DataFrame, transcript_col: str = "transcript", sep: str = ">"
) -> DataFrame:
    """``(depth, prefix, cont)`` rows from already-assembled transcript
    STRINGS (the streaming session aggregate emits ``a>b>c`` per closed
    conversation) — the stream-side twin of :func:`prefix_branching`'s
    label-array explode, sharing the same explode and single-turn guard.
    ``sep`` is treated LITERALLY (``F.split`` takes a regex, so the
    separator is escaped — a ``sep='|'`` caller must not get per-character
    splits while ``array_join`` re-joins with the literal)."""
    import re as _re

    toked = df.select(
        F.split(F.col(transcript_col), _re.escape(sep)).alias("__labels")
    )
    return _explode_prefixes(toked, sep)


def branching_report(pref: DataFrame) -> DataFrame:
    """Aggregate ``(depth, prefix, cont)`` rows into the per-depth branching
    report — single home for the fan-out math (batch and stream paths)."""
    per_prefix = pref.groupBy("depth", "prefix").agg(
        F.countDistinct("cont").alias("fanout"),
        F.count("*").alias("n_cont"),
    )
    return (
        per_prefix.groupBy("depth")
        .agg(
            F.count("*").alias("n_prefixes"),
            F.sum((F.col("fanout") >= 2).cast("long")).alias("n_branching"),
            F.max("fanout").alias("max_fanout"),
            F.sum("n_cont").alias("n_next_turns"),
        )
        .orderBy("depth")
    )

"""Sequential event-pattern matching (a MATCH_RECOGNIZE-lite CEP operator).

Reference analog: none — PipeFlow has no ordered-sequence construct at all
(its closest is the ``RemoveDuplicates`` closure, ``PipeFlow/PipeFlow.cs:
226-231``); this is north-rule surface: "native micro-batch CEP engine over
... transcripts".  The operator detects ordered funnels like
``view -> click+ -> purchase`` per key, in two equivalent forms:

* **batch** (:func:`match_funnels`) — assemble each key's symbol sequence
  with one shuffle (``collect_list`` + ``array_sort``, the same bounded
  per-key state as transcript assembly) and count non-overlapping pattern
  occurrences with JVM ``regexp_extract_all``.  SQL-oracle-able: DuckDB's
  ``string_agg(... ORDER BY) + regexp_extract_all`` computes the identical
  count, so the driver certifies value equality end-to-end.
* **streaming** (:func:`pattern_apply_fn`) — the same pattern as a per-key
  finite automaton over ``applyInPandasWithState``: O(1) state per key
  (current step index only — a ``click+`` run of any length is one int),
  matches that *span micro-batches* are found, emission is immediate on
  completion.  This is the fixed-width-state posture the 10^12-turn scale
  demands: state size is independent of conversation length.

Pattern class and its guarantee
-------------------------------

A pattern is ``[(symbol, one_or_more), ...]`` over single-character symbols,
restricted so that **all step symbols are pairwise distinct** and the final
step is not ``one_or_more`` (an open-ended trailing ``+`` has no well-defined
completion point in a stream).  Within this class the automaton in
:func:`pattern_step` emits *exactly* the non-overlapping leftmost matches of
the equivalent regex (``re.findall`` / Spark & DuckDB ``regexp_extract_all``)
— property-tested against ``re.findall`` on random sequences in
``tests/test_operators.py``.  Distinct symbols are what make the
single-int-state automaton exact: a mismatch character can never be a
partial re-entry into the middle of the pattern, so the only transitions are
advance / continue-run / restart-at-first-symbol / reset.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Step = tuple[str, bool]  # (single-char symbol, one_or_more)

PATTERN_MATCH_SCHEMA = "key string, end_order long"
PATTERN_STATE_SCHEMA = "at int"


def validate_pattern(steps: Sequence[Step]) -> list[Step]:
    """Enforce the exactness preconditions (see module docstring)."""
    steps = [(str(s), bool(p)) for s, p in steps]
    if len(steps) < 2:
        raise ValueError("pattern needs at least 2 steps")
    syms = [s for s, _ in steps]
    if any(len(s) != 1 for s in syms):
        raise ValueError("step symbols must be single characters")
    if len(set(syms)) != len(syms):
        raise ValueError(
            "step symbols must be pairwise distinct — repeated symbols make "
            "single-int automaton state inexact vs regex semantics"
        )
    if steps[-1][1]:
        raise ValueError("final step cannot be one_or_more (no completion point in a stream)")
    return steps


def pattern_regex(steps: Sequence[Step]) -> str:
    """The equivalent regex, identical on Spark / DuckDB / Python ``re``."""
    return "".join(s + ("+" if plus else "") for s, plus in validate_pattern(steps))


def pattern_step(at: int, chars: Sequence[str], steps: Sequence[Step]) -> tuple[int, list[int]]:
    """Advance the automaton over one in-order chunk of symbols.

    ``at`` = number of steps whose minimum occurrence is already consumed
    (0 = idle).  Returns the new state and the 0-based offsets *within this
    chunk* where a match completed.
    """
    ends: list[int] = []
    first = steps[0][0]
    for i, ch in enumerate(chars):
        if at < len(steps) and ch == steps[at][0]:
            at += 1
            if at == len(steps):
                ends.append(i)
                at = 0
        elif at > 0 and steps[at - 1][1] and ch == steps[at - 1][0]:
            pass  # greedy continuation of the current one_or_more run
        elif ch == first:
            at = 1
        else:
            at = 0
    return at, ends


def pattern_apply_fn(
    steps: Sequence[Step],
    symbol_col: str,
    order_cols: Sequence[str],
    idle_gap_ms: int | None = None,
):
    """The automaton as an ``applyInPandasWithState`` function: key state is
    one int, output is one row per completed match ``(key, end_order)``.

    Rows within a batch are processed in ``order_cols`` order; cross-batch
    ordering is the source's arrival contract (the in-order assumption every
    CEP engine makes — same as :mod:`pipeflow_spark.streaming.cep`).

    ``idle_gap_ms`` (requires ``timeout='EventTimeTimeout'`` and an upstream
    watermark): a key whose automaton sees no turn for that long past the
    watermark is *evicted* — its partial progress is dropped and a later
    resumption restarts from scratch.  This bounds total state by the number
    of RECENTLY-ACTIVE conversations instead of every conversation ever
    seen; at 10^12 turns the difference is the job surviving or not.
    Abandoning a partial match on an idle conv is the CEP-correct trade: the
    pattern models a funnel inside one engagement, not across weeks.
    """
    steps = validate_pattern(steps)

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()  # idle conv: drop partial progress, free the slot
            return
        at = state.get[0] if state.exists else 0
        hits: list[tuple[str, int]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(list(order_cols))
            chars = pdf[symbol_col].tolist()
            at, ends = pattern_step(at, chars, steps)
            order_vals = pdf[order_cols[-1]].tolist()
            hits.extend((str(key[0]), int(order_vals[i])) for i in ends)
        state.update((at,))
        if idle_gap_ms is not None:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idle_gap_ms)
        if hits:
            yield pd.DataFrame(hits, columns=["key", "end_order"])

    return fn


def match_funnels(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    symbol_col: str,
    steps: Sequence[Step],
) -> DataFrame:
    """Batch twin: per key, the number of non-overlapping pattern matches.

    One shuffle (the groupBy); per-key state is the symbol sequence — the
    same bounded-by-conversation-length footprint as transcript assembly.
    The regex runs JVM-side (``regexp_extract_all``), no Python in the plan.
    Returns ``key_cols + (seq_len, n_matches)`` for keys with ≥1 match.
    """
    rx = pattern_regex(steps)
    arr = F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in order_cols], F.col(symbol_col).alias("_s")))
    )
    seq = F.array_join(F.transform(arr, lambda x: x["_s"]), "")
    out = (
        df.groupBy(*[F.col(k) for k in key_cols])
        .agg(seq.alias("_seq"))
        .select(
            *key_cols,
            F.length("_seq").alias("seq_len"),
            F.size(F.expr(f"regexp_extract_all(_seq, '{rx}', 0)")).alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
    )
    return out

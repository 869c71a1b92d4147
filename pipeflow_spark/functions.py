"""Python user-defined table functions (UDTFs) — the row → rows surface.

The reference's only row-expanding operator is ``SelectMany``
(``PipeFlow/PipelineExtensions.cs:118-139``), an untyped flatten.  Spark 4
UDTFs are the engine-native typed form: a class with an ``eval`` generator,
callable from SQL as a ``LATERAL`` table argument, with a declared output
schema Catalyst can prune and reason about.  They complete the UDF matrix
alongside scalar ``pandas_udf`` / ``mapInPandas`` / ``applyInPandas`` /
``applyInPandasWithState`` (SURVEY §2.7).

Scale note: both UDTFs are Arrow-optimized (``useArrow=True`` →
``ArrowEvalPythonUDTF`` — batched columnar transport, kept out of the
plan-audit's row-at-a-time bucket), but the ``eval`` generator itself is
still per-row Python — for hot-path JSON flattening prefer JVM
``from_json`` + ``explode`` (see ``operators/jsonpath.py``).  UDTFs earn
their keep where the expansion logic is genuinely imperative (stateful
parsers, irregular grammars) — exactly where the reference reached for
``SelectMany`` with a lambda.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, key string, value string", useArrow=True)
class ExplodeJsonMap:
    """One row per top-level key of a JSON object: ``(pos, key, value)``
    with ``pos`` the document order (insertion order is preserved by the
    parser, making output deterministic).  Non-string values render as
    their JSON text — the same scalar coercion the REST reader applies
    (``rest.py:_coerce``, ApiReader.cs:211-233)."""

    def eval(self, s: str):  # noqa: D102 — generator contract
        if s is None:
            return
        try:
            obj = json.loads(s)
        except ValueError:
            return
        if not isinstance(obj, dict):
            return
        for i, (k, v) in enumerate(obj.items()):
            yield i, k, v if isinstance(v, str) else json.dumps(v)


@udtf(returnType="turn_idx int, role string, text string", useArrow=True)
class ParseTranscriptTurns:
    """Parse a raw multi-turn transcript blob into turn rows.

    Grammar: a turn starts at a line beginning ``<role>:`` for role in
    {system, user, assistant, tool}; subsequent lines without a role prefix
    are continuations (joined with newlines).  Leading text before any role
    marker is ignored.  This is the imperative-parser case UDTFs exist for
    — the stateful line accumulation has no clean ``from_json``/regex
    equivalent at one row per turn.
    """

    ROLES = ("system", "user", "assistant", "tool")

    def eval(self, raw: str):  # noqa: D102
        if raw is None:
            return
        idx, role, buf = 0, None, []
        for line in raw.splitlines():
            head, sep, rest = line.partition(":")
            if sep and head.strip().lower() in self.ROLES:
                if role is not None:
                    yield idx, role, "\n".join(buf).strip()
                    idx += 1
                role, buf = head.strip().lower(), [rest.lstrip()]
            elif role is not None:
                buf.append(line)
        if role is not None:
            yield idx, role, "\n".join(buf).strip()


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``..., LATERAL explode_json_map(x)``)."""
    spark.udtf.register("explode_json_map", ExplodeJsonMap)
    spark.udtf.register("parse_transcript_turns", ParseTranscriptTurns)

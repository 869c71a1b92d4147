"""Custom operators composed from DataFrame primitives (SURVEY.md §2.6 and the
training-data-pipeline extensions): dedupe family, similarity search, text
analysis, as-of/range joins, sessionization, skew-aware aggregation,
multimodal plumbing."""

from . import (  # noqa: F401
    asof,
    bloom,
    bpe,
    convtree,
    decontaminate,
    dedupe,
    graph,
    heavy,
    jsonpath,
    multimodal,
    partition,
    quantile,
    retrieval,
    sampling,
    scd,
    sessionize,
    similarity,
    skew,
    text,
    zorder,
)

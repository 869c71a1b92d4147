"""JSONPath projection over JSON-string columns.

Reference analog: ``JsonReader.SelectPath("$.a.b[0]")``
(``PipeFlow/Json/JsonReader.cs:38-42,73-115``) — the reference walks the
parsed token tree per row; here the path evaluates JVM-side via
``get_json_object`` (same ``$.field[idx].nested`` subset), so it runs inside
whole-stage codegen with no Python and composes with pushdown: a filter on an
extracted value prunes rows before any downstream stage.

For repeated multi-field extraction at scale prefer :func:`parse_json_schema`
(``from_json`` with an explicit schema): one parse per row instead of one per
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_path(col: Column | str, path: str, cast: str | None = None) -> Column:
    """Extract a JSONPath from a JSON string column; missing path → null
    (reference parity: JsonReader.cs:87-90 returns no row content rather than
    erroring).  ``cast`` applies ``try_cast`` so malformed values null out
    instead of failing the job under ANSI mode."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.get_json_object(c, path)
    return out.try_cast(cast) if cast else out


def select_paths(df: DataFrame, col: str, paths: dict[str, str], keep: list[str] | None = None) -> DataFrame:
    """Project multiple JSONPaths into named columns: ``{alias: path}``."""
    keep_cols = keep if keep is not None else df.columns
    return df.select(*keep_cols, *[select_path(col, p).alias(a) for a, p in paths.items()])


def parse_json_schema(df: DataFrame, col: str, schema: str, out: str = "parsed") -> DataFrame:
    """One-shot typed parse (``from_json``) — the scale path when many fields
    are read from the same JSON column."""
    return df.withColumn(out, F.from_json(F.col(col), schema))

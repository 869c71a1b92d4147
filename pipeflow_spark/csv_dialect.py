"""CSV dialect parity with the reference reader.

Two behaviors ``spark.read.csv`` does not reproduce:

* **Headerless column synthesis** — ``Column{i}`` (0-based) names
  (``PipeFlow/CsvReader.cs:91-96``) instead of Spark's ``_c{i}``.
* **ConvertValue type inference** (``PipeFlow/CsvReader.cs:208-234``), in
  priority order per cell: empty → null; int if ≤ 10 chars and parses
  (32-bit); double if it contains ``.`` and parses; ``true/false`` in 3
  casings → bool; contains ``-`` or ``/`` and parses → timestamp; else
  string.

The reference decides per *cell* (a column can be heterogeneous); a Spark
DataFrame has one type per column, so :func:`infer_pipeflow_types` applies the
same rule ladder at column granularity: a column gets a type iff **every**
non-empty cell satisfies that rule — the strongest typing that loses no cell,
and exactly what the per-cell rules converge to on homogeneous data.  The
decision needs one aggregation pass over the data, the same cost class as
``inferSchema`` (which also scans), and the cast itself is JVM ``try_cast``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_RE = r"^[+-]?[0-9]+$"
_BOOLS = ["true", "True", "TRUE", "false", "False", "FALSE"]


def synthesize_headers(df: DataFrame) -> DataFrame:
    """Rename Spark's ``_c{i}`` headerless columns to the reference's
    ``Column{i}`` (CsvReader.cs:91-96)."""
    return df.toDF(*[
        f"Column{name[2:]}" if name.startswith("_c") and name[2:].isdigit() else name
        for name in df.columns
    ])


def infer_pipeflow_types(df: DataFrame) -> DataFrame:
    """Apply the ConvertValue rule ladder to an all-string DataFrame.

    One distributed aggregation computes, per column, whether every non-empty
    cell passes each rule (``min`` over booleans = AND, vacuously true on
    empty/null cells); the winning rule's ``try_cast`` is then applied.
    """
    checks = []
    for c in df.columns:
        cell = F.when(F.length(F.col(c)) == 0, F.lit(None)).otherwise(F.col(c))
        nn = cell.isNotNull()

        def _all(pred, tag, _nn=nn):
            return F.min(F.when(_nn, pred).otherwise(F.lit(True))).alias(tag)

        checks += [
            _all((F.length(cell) <= 10) & cell.rlike(_INT_RE) & cell.try_cast("int").isNotNull(),
                 f"{c}\tint"),
            _all(cell.contains(".") & cell.try_cast("double").isNotNull(), f"{c}\tdouble"),
            _all(cell.isin(*_BOOLS), f"{c}\tboolean"),
            _all((cell.contains("-") | cell.contains("/")) & cell.try_cast("timestamp").isNotNull(),
                 f"{c}\ttimestamp"),
            F.max(nn.cast("int")).alias(f"{c}\tany"),
        ]
    flags = df.agg(*checks).first().asDict()

    out_cols = []
    for c in df.columns:
        cell = F.when(F.length(F.col(c)) == 0, F.lit(None)).otherwise(F.col(c))
        target = None
        if flags[f"{c}\tany"]:  # all-empty columns stay string
            for t in ("int", "double", "boolean", "timestamp"):  # rule priority
                if flags[f"{c}\t{t}"]:
                    target = t
                    break
        out_cols.append((cell.try_cast(target) if target else cell).alias(c))
    return df.select(*out_cols)


def read_pipeflow_csv(
    spark,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    infer: bool = True,
    **options,
) -> DataFrame:
    """The reference CSV reader's full dialect: RFC-4180 quoting with ``""``
    escapes and embedded newlines (multiLine), trim, ``Column{i}`` synthesis
    when headerless, ConvertValue inference."""
    df = (
        spark.read.options(
            header=header,
            sep=delimiter,
            quote='"',
            escape='"',
            multiLine=True,
            ignoreLeadingWhiteSpace=True,
            ignoreTrailingWhiteSpace=True,
            **options,
        ).csv(path)
    )
    if not header:
        df = synthesize_headers(df)
    if infer:
        df = infer_pipeflow_types(df)
    return df

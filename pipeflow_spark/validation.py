"""Validation rule DSL compiled to native Column expressions.

Re-expresses the reference's fluent per-column validator
(``PipeFlow/Validation/DataValidator.cs:17-410``) as vectorized boolean
expressions: each rule is a ``(Column-predicate, message)`` pair, the whole
validator folds to one ``AND`` (for filtering) or an ``array<string>`` of
failed-rule messages (for side outputs).  All JVM-side — no Python in the hot
path — so validation is free to run inside a streaming micro-batch without the
reference's eager ``ToList()`` materialization (``PipeFlow/PipeFlow.cs:523-526``).

Rule semantics match the reference: null/absent passes every rule except
``required`` (``DataValidator.cs:127-143`` vs e.g. Email ``:145-170`` which
short-circuits true on null).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference regex, DataValidator.cs:148
EMAIL_PATTERN = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"


class ValidationStrategy(enum.Enum):
    """``PipeFlow/Validation/DataValidator.cs:404-410``."""

    THROW = "throw_exception"
    SKIP = "skip"
    LOG = "log"
    FIX = "fix"


class ValidationError(RuntimeError):
    pass


def _pass_if_null(col: Column, pred: Column) -> Column:
    """Non-required rules pass null values (reference behavior)."""
    return F.when(col.isNull(), F.lit(True)).otherwise(pred)


@dataclass
class _Rule:
    message: str
    predicate: Column


@dataclass
class ColumnRules:
    """Fluent per-column rule builder — ``validator.column('x').required().email()``."""

    validator: "Validator"
    name: str
    rules: list[_Rule] = field(default_factory=list)

    def _col(self) -> Column:
        return F.col(self.name)

    def _add(self, message: str, predicate: Column) -> "ColumnRules":
        self.rules.append(_Rule(message, predicate))
        return self

    def required(self) -> "ColumnRules":
        """DataValidator.cs:127-143 — non-null, non-whitespace."""
        c = self._col()
        return self._add(
            f"{self.name} is required",
            c.isNotNull() & (F.trim(c.cast("string")) != F.lit("")),
        )

    def email(self) -> "ColumnRules":
        """DataValidator.cs:145-170."""
        c = self._col()
        return self._add(f"{self.name} is not a valid email", _pass_if_null(c, c.rlike(EMAIL_PATTERN)))

    def regex(self, pattern: str) -> "ColumnRules":
        """DataValidator.cs:172-199."""
        c = self._col()
        return self._add(f"{self.name} does not match pattern", _pass_if_null(c, c.rlike(pattern)))

    def range(self, lo: float, hi: float) -> "ColumnRules":
        """DataValidator.cs:201-235 — parse-to-double then bounds; a non-null
        value that fails to parse is an error (``try_cast`` → null; plain cast
        would raise under Spark 4's ANSI default)."""
        c = self._col()
        d = c.try_cast("double")
        return self._add(
            f"{self.name} out of range [{lo}, {hi}]",
            _pass_if_null(c, d.isNotNull() & d.between(lo, hi)),
        )

    def min_length(self, n: int) -> "ColumnRules":
        """DataValidator.cs:237-263."""
        c = self._col()
        return self._add(f"{self.name} shorter than {n}", _pass_if_null(c, F.length(c.cast("string")) >= n))

    def max_length(self, n: int) -> "ColumnRules":
        """DataValidator.cs:265-291."""
        c = self._col()
        return self._add(f"{self.name} longer than {n}", _pass_if_null(c, F.length(c.cast("string")) <= n))

    def isin(self, *values) -> "ColumnRules":
        """DataValidator.cs:319-344 (In)."""
        c = self._col()
        return self._add(f"{self.name} not in allowed set", _pass_if_null(c, c.isin(*values)))

    def not_in(self, *values) -> "ColumnRules":
        """DataValidator.cs:346-371."""
        c = self._col()
        return self._add(f"{self.name} in forbidden set", _pass_if_null(c, ~c.isin(*values)))

    def of_type(self, spark_type: str) -> "ColumnRules":
        """DataValidator.cs:373-402 — value coercible to T (try_cast survives)."""
        c = self._col()
        return self._add(
            f"{self.name} is not of type {spark_type}",
            c.isNull() | c.try_cast(spark_type).isNotNull(),
        )

    def custom(self, predicate: Column, message: str) -> "ColumnRules":
        """DataValidator.cs:293-317 — arbitrary predicate.  Callers supply a
        Column expression (or a vectorized pandas_udf result) — never a
        row-at-a-time lambda."""
        return self._add(message, _pass_if_null(self._col(), predicate))

    # fluent continuation (reference `.And.Column(...)`)
    def column(self, name: str) -> "ColumnRules":
        return self.validator.column(name)

    @property
    def and_(self) -> "Validator":
        return self.validator


class Validator:
    """Fluent validator — ``DataValidator.cs:17-20,48-120``."""

    def __init__(self) -> None:
        self._columns: list[ColumnRules] = []

    def column(self, name: str) -> ColumnRules:
        cr = ColumnRules(self, name)
        self._columns.append(cr)
        return cr

    def _all_rules(self) -> list[_Rule]:
        return [r for cr in self._columns for r in cr.rules]

    def valid_expr(self) -> Column:
        """Single boolean: every rule passes."""
        rules = self._all_rules()
        if not rules:
            return F.lit(True)
        acc = rules[0].predicate
        for r in rules[1:]:
            acc = acc & r.predicate
        return acc

    def errors_expr(self) -> Column:
        """``array<string>`` of failed-rule messages (empty = valid) —
        ValidateWithResults parity (``ValidationResult.cs:7-42``)."""
        rules = self._all_rules()
        if not rules:
            return F.array().cast("array<string>")
        return F.filter(
            F.array(*[F.when(~r.predicate, F.lit(r.message)).otherwise(F.lit(None)) for r in rules]),
            lambda x: x.isNotNull(),
        )

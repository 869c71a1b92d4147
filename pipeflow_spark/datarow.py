"""Driver-side DataRow view — API parity with ``PipeFlow.Core.DataRow``
(``PipeFlow/DataRow.cs:1-120``): case-insensitive name access, positional
access in column-encounter order, ``get_value`` with type coercion, and
dict export.

This is deliberately NOT a distributed type: rows materialize on the driver
only at Pipeline terminals (``to_datarows()``, a ``to_list()`` sibling), so
the compatibility shim costs nothing in the executor hot path — transforms
stay Column-algebra / Arrow-vectorized per the north rule.  Its job is
migration ergonomics: reference code that walked ``foreach (var row in
pipeline)`` indexing ``row["Name"]``/``row[0]`` keeps working verbatim on
this engine's terminal output.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

_NULL_DEFAULTS = {int: 0, float: 0.0, bool: False, complex: 0j}


class DataRow:
    """Ordered, case-insensitive column→value mapping.

    Semantics pinned 1:1 to the reference (``DataRow.cs``):

    * name access is case-insensitive (``OrdinalIgnoreCase`` dict); a miss
      raises ``KeyError`` (reference: ``KeyNotFoundException``);
    * positional access follows column ENCOUNTER order; out-of-range raises
      ``IndexError``; positional set updates the existing column only;
    * ``get_value(name, t)``: ``None`` → the type's C# ``default(T)``
      (0 / 0.0 / False; ``None`` for reference-like types), already-typed
      values pass through, anything else coerces via the target type with
      failures raising ``TypeError`` (reference: ``InvalidCastException``);
    * ``try_get_value`` never raises — ``(False, default)`` on a missing
      column or failed coercion.
    """

    __slots__ = ("_data", "_order")

    def __init__(self, data: dict[str, Any] | None = None):
        self._data: dict[str, Any] = {}  # lower-cased key → value
        self._order: list[str] = []  # original-cased keys, encounter order
        for k, v in (data or {}).items():
            self[k] = v

    @classmethod
    def from_spark(cls, row) -> "DataRow":
        """Build from a ``pyspark.sql.Row`` (terminal collect output)."""
        return cls(row.asDict(recursive=False))

    # -- indexers (DataRow.cs:31-60) ------------------------------------------------------
    def __getitem__(self, key: str | int) -> Any:
        if isinstance(key, int):
            if not 0 <= key < len(self._order):
                raise IndexError(f"Column index {key} is out of range")
            return self._data[self._order[key].lower()]
        lk = key.lower()
        if lk not in self._data:
            raise KeyError(f"Column '{key}' not found")
        return self._data[lk]

    def __setitem__(self, key: str | int, value: Any) -> None:
        if isinstance(key, int):
            if not 0 <= key < len(self._order):
                raise IndexError(f"Column index {key} is out of range")
            self._data[self._order[key].lower()] = value
            return
        lk = key.lower()
        if lk not in self._data:
            self._order.append(key)
        self._data[lk] = value

    # -- queries (DataRow.cs:62-103) ------------------------------------------------------
    def contains_column(self, name: str) -> bool:
        return name.lower() in self._data

    def get_value(self, name: str, t: type) -> Any:
        value = self[name]
        if value is None:
            return _NULL_DEFAULTS.get(t)
        if isinstance(value, t) and not (t is int and isinstance(value, bool)):
            return value
        try:
            return t(value)
        except Exception as ex:  # reference: InvalidCastException wrapping
            raise TypeError(
                f"Cannot convert column '{name}' value to {t.__name__}"
            ) from ex

    def try_get_value(self, name: str, t: type) -> tuple[bool, Any]:
        if not self.contains_column(name):
            return False, _NULL_DEFAULTS.get(t)
        try:
            return True, self.get_value(name, t)
        except TypeError:
            return False, _NULL_DEFAULTS.get(t)

    def get_column_names(self) -> list[str]:
        return list(self._order)

    def to_dictionary(self) -> dict[str, Any]:
        return {k: self._data[k.lower()] for k in self._order}

    # -- python protocol ------------------------------------------------------------------
    def __contains__(self, name: object) -> bool:
        return isinstance(name, str) and self.contains_column(name)

    def __len__(self) -> int:
        return len(self._order)

    def __iter__(self) -> Iterator[str]:
        return iter(self._order)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, DataRow) and other.to_dictionary() == self.to_dictionary()

    def __repr__(self) -> str:  # DataRow.cs ToString(): "{Name: John, Age: 25}"
        pairs = ", ".join(
            f"{k}: {'null' if self._data[k.lower()] is None else self._data[k.lower()]}"
            for k in self._order
        )
        return "{" + pairs + "}"


def to_datarows(rows: Iterable) -> list[DataRow]:
    """Convert collected Spark Rows to DataRows (terminal helper)."""
    return [DataRow.from_spark(r) for r in rows]

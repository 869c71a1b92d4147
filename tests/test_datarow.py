"""Ports of PipeFlow.Tests/DataRowTests.cs — same fixtures, same assertions —
over the driver-side DataRow view (`pipeflow_spark/datarow.py`), plus the
Pipeline.to_datarows() terminal on a real Spark collect."""

import pytest

from pipeflow_spark import DataRow, read


def test_constructor_with_dict():
    # DataRowTests.cs:11-25
    row = DataRow({"Name": "John", "Age": 25, "Active": True})
    assert row["Name"] == "John"
    assert row["Age"] == 25
    assert row["Active"] is True


def test_indexer_by_column_name():
    # DataRowTests.cs:27-36
    row = DataRow()
    row["FirstName"] = "Jane"
    row["LastName"] = "Doe"
    assert row["FirstName"] == "Jane"
    assert row["LastName"] == "Doe"


def test_indexer_by_column_index():
    # DataRowTests.cs:38-47 — positional access in encounter order
    row = DataRow()
    row["Column1"] = "Value1"
    row["Column2"] = "Value2"
    assert row[0] == "Value1"
    assert row[1] == "Value2"
    with pytest.raises(IndexError):
        row[2]


def test_contains_column():
    # DataRowTests.cs:49-57
    row = DataRow()
    row["Existing"] = "Value"
    assert row.contains_column("Existing")
    assert not row.contains_column("NonExisting")


def test_get_value_with_type_conversion():
    # DataRowTests.cs:59-71 — "42" → 42 and 100 → "100"
    row = DataRow()
    row["StringNumber"] = "42"
    row["IntNumber"] = 100
    assert row.get_value("StringNumber", int) == 42
    assert row.get_value("IntNumber", str) == "100"
    with pytest.raises(TypeError, match="Cannot convert column 'Junk'"):
        row["Junk"] = "not-a-number"
        row.get_value("Junk", int)


def test_try_get_value_valid_column():
    # DataRowTests.cs:73-83
    row = DataRow()
    row["Age"] = 30
    ok, age = row.try_get_value("Age", int)
    assert ok and age == 30


def test_try_get_value_invalid_column():
    # DataRowTests.cs:85-94 — False + default(T) (0 for int)
    row = DataRow()
    ok, value = row.try_get_value("NonExisting", int)
    assert not ok and value == 0


def test_get_column_names():
    # DataRowTests.cs:96-109
    row = DataRow()
    row["Col1"], row["Col2"], row["Col3"] = "A", "B", "C"
    assert row.get_column_names() == ["Col1", "Col2", "Col3"]


def test_to_dictionary():
    # DataRowTests.cs:111-123
    row = DataRow()
    row["Key1"] = "Value1"
    row["Key2"] = 123
    d = row.to_dictionary()
    assert len(d) == 2 and d["Key1"] == "Value1" and d["Key2"] == 123


def test_case_insensitive_column_access():
    # DataRowTests.cs:125-134
    row = DataRow()
    row["FirstName"] = "John"
    assert row["firstname"] == "John"
    assert row["FIRSTNAME"] == "John"
    assert row["FirstName"] == "John"


def test_null_returns_type_default():
    # DataRow.cs:70-72 — GetValue<T> on null returns default(T)
    row = DataRow({"N": None})
    assert row.get_value("N", int) == 0
    assert row.get_value("N", float) == 0.0
    assert row.get_value("N", bool) is False
    assert row.get_value("N", str) is None


def test_pipeline_to_datarows(spark):
    """The terminal on a real collect: reference-style row walking works on
    this engine's output verbatim."""
    rows = (
        read.collection(
            spark,
            [("Ann", 31), ("Bob", 19)],
            "Name string, Age int",
        )
        .filter("Age > 25")
        .to_datarows()
    )
    assert len(rows) == 1
    (r,) = rows
    assert r["name"] == "Ann" and r.get_value("AGE", str) == "31"
    assert set(r.get_column_names()) == {"Name", "Age"}

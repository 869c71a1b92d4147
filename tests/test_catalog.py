"""TableCatalog: the Iceberg/parquet config-flip table store (SURVEY.md §7.0).

The parquet snapshot-pointer path is exercised end-to-end; the Iceberg path
(identifiers, session conf, MERGE INTO text) is verified structurally and its
runtime branch is gated on the jar being present (absent in this sandbox).
"""

import os

import pytest
from pyspark.sql import functions as F

from pipeflow_spark.catalog import (
    TableCatalog,
    iceberg_available,
    iceberg_session_conf,
    merge_into_sql,
)


def _cat(spark, tmp_path):
    return TableCatalog(spark, str(tmp_path / "wh"), format="parquet")


def test_autodetect_falls_back_to_parquet(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "wh"))
    assert cat.format == ("iceberg" if iceberg_available(spark) else "parquet")


def test_iceberg_format_requires_jar(spark, tmp_path):
    if iceberg_available(spark):
        pytest.skip("iceberg jar present — explicit format is legal")
    with pytest.raises(RuntimeError, match="iceberg"):
        TableCatalog(spark, str(tmp_path / "wh"), format="iceberg")


def test_write_read_roundtrip_and_overwrite(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    df = spark.range(5).withColumn("v", F.col("id") * 2)
    cat.write(df, "t")
    assert sorted(r.v for r in cat.read("t").collect()) == [0, 2, 4, 6, 8]
    cat.write(spark.range(2).withColumn("v", F.lit(99)), "t")  # atomic replace
    assert sorted(r.v for r in cat.read("t").collect()) == [99, 99]
    # exactly one committed snapshot dir remains after overwrite expiry
    snaps = [d for d in os.listdir(cat.ident("t")) if d.startswith("snapshot-")]
    assert len(snaps) == 1


def test_append_unions_previous_snapshot(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.write(spark.range(3), "t")
    cat.write(spark.range(3, 5), "t", mode="append")
    assert sorted(r.id for r in cat.read("t").collect()) == [0, 1, 2, 3, 4]


def test_upsert_do_update_and_do_nothing(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    cat.write(base, "t")
    inc = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    cat.upsert(inc, "t", keys=["k"])  # DO UPDATE: incoming wins
    assert {(r.k, r.v) for r in cat.read("t").collect()} == {(1, "a"), (2, "B"), (3, "c")}
    inc2 = spark.createDataFrame([(3, "X"), (4, "d")], "k int, v string")
    cat.upsert(inc2, "t", keys=["k"], do_update=False)  # DO NOTHING: existing wins
    assert {(r.k, r.v) for r in cat.read("t").collect()} == {
        (1, "a"), (2, "B"), (3, "c"), (4, "d")
    }


def test_exists_and_drop(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    assert not cat.exists("t")
    cat.write(spark.range(1), "t")
    assert cat.exists("t")
    cat.drop("t")
    assert not cat.exists("t")


def test_iceberg_session_conf_shape():
    conf = iceberg_session_conf("/wh", catalog="local")
    assert conf["spark.sql.catalog.local"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.local.warehouse"] == "/wh"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_merge_into_sql_text():
    up = merge_into_sql("local.db.t", "src", ["k", "a", "b"], ["k"])
    assert up == (
        "MERGE INTO local.db.t t USING src s ON t.k = s.k"
        " WHEN MATCHED THEN UPDATE SET t.a = s.a, t.b = s.b"
        " WHEN NOT MATCHED THEN INSERT (k, a, b) VALUES (s.k, s.a, s.b)"
    )
    nothing = merge_into_sql("t", "s", ["k", "a"], ["k"], do_update=False)
    assert "WHEN MATCHED" not in nothing and "WHEN NOT MATCHED THEN INSERT" in nothing


def test_iceberg_roundtrip(spark, tmp_path):  # pragma: no cover - gated
    if not iceberg_available(spark):
        pytest.skip("requires iceberg-spark-runtime jar (not in sandbox)")
    cat = TableCatalog(spark, str(tmp_path / "wh"), format="iceberg")
    cat.write(spark.range(3), "t")
    assert cat.read("t").count() == 3


def test_catalog_time_travel_parquet(spark, tmp_path):
    from pipeflow_spark.catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path), format="parquet")
    for val in ("a", "b", "c"):
        cat.upsert(
            spark.createDataFrame([(1, val)], "id long, v string"),
            "tt", keys=["id"], keep_snapshots=3,
        )
    versions = [s["version"] for s in cat.snapshots("tt")]
    assert versions == [1, 2, 3]
    assert cat.read("tt", version=1).first().v == "a"
    assert cat.read("tt", version=2).first().v == "b"
    assert cat.read("tt").first().v == "c"
    # rollback = O(1) ref move: current flips, history stays monotonic
    cat.rollback("tt", 1)
    assert cat.read("tt").first().v == "a"
    cat.upsert(
        spark.createDataFrame([(1, "d")], "id long, v string"),
        "tt", keys=["id"], keep_snapshots=4,
    )
    assert cat.read("tt").first().v == "d"
    assert [s["version"] for s in cat.snapshots("tt")][-1] == 4


def test_catalog_hidden_partitioned_write_and_pruned_read(spark, tmp_path):
    """partition_specs on the parquet branch: snapshot laid out by the
    transforms, read_hidden translates source predicates to partition
    predicates and hides the layout columns; append preserves the layout."""
    import re
    from datetime import datetime as DT

    from pipeflow_spark.catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "wh"), format="parquet")
    df = spark.createDataFrame(
        [(i, DT(2024, 1 + i % 3, 1 + i % 5), f"u{i%4}") for i in range(60)],
        "id long, ts timestamp, user string",
    )
    specs = ["days(ts)", "bucket(4, id)"]
    cat.write(df, "ev", partition_specs=specs)
    back = cat.read_hidden("ev", specs)
    assert sorted(back.columns) == ["id", "ts", "user"] and back.count() == 60

    out = cat.read_hidden("ev", specs, filters=[("ts", ">=", "2024-03-01")])
    assert out.count() == df.filter(F.col("ts") >= "2024-03-01").count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ts_days" in m.group(1)

    cat.write(
        spark.createDataFrame([(100, DT(2024, 3, 2), "u9")],
                              "id long, ts timestamp, user string"),
        "ev", mode="append", partition_specs=specs,
    )
    assert cat.read_hidden("ev", specs).count() == 61
    assert cat.read_hidden("ev", specs, filters=[("id", "=", 100)]).count() == 1


def test_iceberg_transform_mapping():
    import pytest as _pytest

    from pipeflow_spark.catalog import _iceberg_transform

    assert _iceberg_transform("days(ts)") is not None
    assert _iceberg_transform("bucket(16, id)") is not None
    assert _iceberg_transform("identity(region)") is not None
    with _pytest.raises(ValueError, match="truncate"):
        _iceberg_transform("truncate(4, code)")


def test_catalog_partition_specs_persisted_lifecycle(spark, tmp_path):
    """Specs live in table metadata: append without re-passing them keeps
    the layout, mismatched specs raise, plain read() hides the derived
    layout columns, overwrite-without-specs de-partitions."""
    from datetime import datetime as DT

    from pipeflow_spark.catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "wh"), format="parquet")
    schema = "id long, ts timestamp, user string"
    df = spark.createDataFrame(
        [(i, DT(2024, 1 + i % 3, 1 + i % 5), f"u{i%4}") for i in range(30)], schema
    )
    specs = ["days(ts)", "bucket(4, id)"]
    cat.write(df, "ev", partition_specs=specs)
    # plain read(): hidden contract holds on every read path
    assert sorted(cat.read("ev").columns) == ["id", "ts", "user"]
    # append WITHOUT specs: stored layout reused, not crashed/dropped
    cat.write(
        spark.createDataFrame([(99, DT(2024, 3, 2), "u9")], schema),
        "ev", mode="append",
    )
    assert cat.read_hidden("ev").count() == 31  # specs loaded from metadata
    pruned = cat.read_hidden("ev", filters=[("id", "=", 99)])
    assert pruned.count() == 1
    # mismatched specs on append raise instead of silently re-laying
    import pytest as _pytest

    with _pytest.raises(ValueError, match="persisted layout"):
        cat.write(
            spark.createDataFrame([(100, DT(2024, 3, 3), "ux")], schema),
            "ev", mode="append", partition_specs=["days(ts)"],
        )
    # overwrite without specs de-partitions and clears metadata
    cat.write(df, "ev")
    assert cat._load_specs("ev") is None
    assert sorted(cat.read("ev").columns) == ["id", "ts", "user"]


def test_partition_specs_commit_inside_snapshot(spark, tmp_path):
    """ADVICE r3: the spec list must be covered by the SAME atomic commit
    point as the data.  The file lives inside the snapshot dir and is
    written before the pointer flip — a crash between data-write and flip
    leaves the old snapshot (with its own specs) fully consistent."""
    import json
    import os
    from datetime import datetime as DT

    from pipeflow_spark import sinks
    from pipeflow_spark.catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "wh"), format="parquet")
    schema = "id long, ts timestamp, user string"
    df = spark.createDataFrame(
        [(i, DT(2024, 1 + i % 3, 1 + i % 5), f"u{i%4}") for i in range(10)], schema
    )
    cat.write(df, "ev", partition_specs=["days(ts)"])
    snap = sinks._current_snapshot(cat.ident("ev"))
    spec_file = os.path.join(snap, "_partition_specs.json")
    assert os.path.exists(spec_file), "specs must live inside the committed snapshot"
    assert json.load(open(spec_file)) == ["days(ts)"]
    assert cat._load_specs("ev") == ["days(ts)"]
    # no stray post-flip table-level spec file in the new protocol
    assert not os.path.exists(os.path.join(cat.ident("ev"), "_partition_specs.json"))

    # a NEW overwrite that crashes BEFORE its flip leaves the committed
    # snapshot (and its specs) untouched: simulate by writing an orphan
    # snapshot dir with different specs but never publishing it
    orphan = os.path.join(cat.ident("ev"), "snapshot-deadbeef0000")
    os.makedirs(orphan)
    json.dump(["bucket(4, id)"], open(os.path.join(orphan, "_partition_specs.json"), "w"))
    assert cat._load_specs("ev") == ["days(ts)"], "uncommitted snapshot must not leak specs"
    assert cat.read_hidden("ev", filters=[("id", "=", 3)]).count() == 1

    # legacy tables (spec file at table level, pre-protocol) still resolve
    legacy = TableCatalog(spark, str(tmp_path / "wh2"), format="parquet")
    legacy.write(df, "old", partition_specs=["days(ts)"])
    snap2 = sinks._current_snapshot(legacy.ident("old"))
    os.rename(
        os.path.join(snap2, "_partition_specs.json"),
        os.path.join(legacy.ident("old"), "_partition_specs.json"),
    )
    assert legacy._load_specs("old") == ["days(ts)"]

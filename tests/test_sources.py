"""Source-dialect parity: reference CSV dialect (headerless Column{i},
ConvertValue inference — CsvReader.cs:91-96, 208-234, CsvTests.cs:43-109),
JSONPath projection (JsonReader.cs:38-42,73-115), streaming CSV source
(CsvReaderAsync.cs:71-124), and the Validate LOG observe() side output."""

import datetime as dt

from pyspark.sql import functions as F

from pipeflow_spark import Pipeline, ValidationStrategy, Validator, read
from pipeflow_spark.csv_dialect import infer_pipeflow_types, read_pipeflow_csv
from pipeflow_spark.operators.jsonpath import parse_json_schema, select_path, select_paths


# -- CSV dialect --------------------------------------------------------------

def test_headerless_column_synthesis(spark, tmp_path):
    """CsvTests.cs:94-109 — no header row → Column0, Column1, ..."""
    p = tmp_path / "nohdr.csv"
    p.write_text("John,25\nJane,30\n")
    df = read_pipeflow_csv(spark, str(p), header=False)
    assert df.columns == ["Column0", "Column1"]
    rows = sorted((r.Column0, r.Column1) for r in df.collect())
    assert rows == [("Jane", 30), ("John", 25)]  # and inference typed the ints


def test_convert_value_inference(spark, tmp_path):
    """CsvReader.cs:208-234 rule ladder: int / double / bool(3 casings) /
    DateTime(- or /) / string; empty cell → null."""
    p = tmp_path / "typed.csv"
    p.write_text(
        "i,d,b,ts,s,mixed,empty\n"
        "42,1.5,true,2024-01-02 03:04:05,hello,1,\n"
        "-7,2.25,FALSE,2024-06-07 08:09:10,world,x,\n"
        ",3.5,True,2025-12-31 00:00:00,!,2,\n"
    )
    df = read_pipeflow_csv(spark, str(p))
    types = dict(df.dtypes)
    assert types == {
        "i": "int", "d": "double", "b": "boolean", "ts": "timestamp",
        "s": "string", "mixed": "string", "empty": "string",
    }
    rows = df.orderBy("d").collect()
    assert rows[0].i == 42 and rows[0].b is True
    assert rows[0].ts == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert rows[2].i is None  # empty cell → null
    assert [r.empty for r in rows] == [None, None, None]


def test_convert_value_int_width_rules(spark):
    """>10 chars or >int32 does not become int (int.TryParse parity);
    a column mixing digits and '.' numbers is not all-int → double wins only
    if every cell has a '.'."""
    df = spark.createDataFrame(
        [("12345678901", "3000000000", "1.5"), ("5", "12", "2")],
        "a string, b string, c string",
    )
    out = infer_pipeflow_types(df)
    types = dict(out.dtypes)
    assert types["a"] == "string"  # 11 chars
    assert types["b"] == "string"  # > int32 max
    assert types["c"] == "string"  # "2" has no '.', "1.5" isn't int

def test_read_pipeflow_csv_quoted_roundtrip(spark, tmp_path):
    """CsvTests.cs:61-75 — quoted fields with commas and '""' escapes."""
    p = tmp_path / "quoted.csv"
    p.write_text('name,quote\n"Smith, John","He said ""hi"""\n')
    df = read_pipeflow_csv(spark, str(p))
    r = df.first()
    assert r.name == "Smith, John" and r.quote == 'He said "hi"'


# -- JSONPath -----------------------------------------------------------------

def test_select_path_nested(spark):
    df = spark.createDataFrame(
        [(1, '{"a": {"b": [10, 20]}, "name": "x"}'), (2, '{"a": {"b": []}}')],
        "id int, js string",
    )
    out = df.select(
        "id",
        select_path("js", "$.a.b[0]", cast="int").alias("b0"),
        select_path("js", "$.name").alias("nm"),
    ).orderBy("id").collect()
    assert (out[0].b0, out[0].nm) == (10, "x")
    assert (out[1].b0, out[1].nm) == (None, None)  # missing path → null


def test_select_paths_and_schema_parse(spark):
    df = spark.createDataFrame([(1, '{"k": 7, "tag": "t"}')], "id int, js string")
    out = select_paths(df, "js", {"k": "$.k", "tag": "$.tag"}, keep=["id"]).first()
    assert (out.id, out.k, out.tag) == (1, "7", "t")
    parsed = parse_json_schema(df, "js", "k int, tag string").select("parsed.k", "parsed.tag").first()
    assert (parsed.k, parsed.tag) == (7, "t")


def test_pipeline_select_path(spark):
    df = spark.createDataFrame([(1, '{"k": 3}')], "id int, props string")
    out = Pipeline(df).select_path("k", "props", "$.k", cast="int").df.first()
    assert out.k == 3


# -- Validate LOG side output -------------------------------------------------

def test_validate_log_keeps_rows_and_counts(spark):
    v = Validator()
    v.column("age").range(0, 100)
    df = spark.createDataFrame([(1, 25), (2, 150), (3, -1), (4, 99)], "id int, age int")
    p = Pipeline(df).validate(v, ValidationStrategy.LOG)
    rows = p.to_list()
    assert len(rows) == 4  # LOG keeps every row (PipeFlow.cs:536-552)
    m = p.validation_observation.get
    assert m["invalid_rows"] == 2 and m["total_rows"] == 4


# -- Streaming CSV source -----------------------------------------------------

def test_stream_csv_window_agg_matches_batch(spark, tmp_path):
    """Stream a CSV directory through a tumbling window aggregate and match
    the batch twin on the same files (CsvReaderAsync parity, distributed)."""
    from pipeflow_spark.streaming import StreamingPipeline

    src = tmp_path / "csv_src"
    src.mkdir()
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [("c1", i, "user", base + dt.timedelta(minutes=7 * i)) for i in range(10)]
    rows += [("c2", i, "assistant", base + dt.timedelta(minutes=11 * i)) for i in range(6)]
    for fi in range(2):
        with open(src / f"part{fi}.csv", "w") as f:
            f.write("conv_id,turn_idx,role,ts\n")
            for c, i, role, ts in rows[fi * 8:(fi + 1) * 8]:
                f.write(f"{c},{i},{role},{ts:%Y-%m-%d %H:%M:%S}\n")
    schema = "conv_id string, turn_idx int, role string, ts timestamp"
    sp = (
        StreamingPipeline.read_csv_stream(spark, str(src), schema, max_files_per_trigger=1)
        .with_watermark("ts", "10 minutes")
        .tumbling_agg("ts", "30 minutes", ["conv_id"], F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "conv_id", "n")
    )
    q = sp.df.writeStream.outputMode("append").format("memory") \
        .queryName("csv_stream_t").trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {(r.ws, r.conv_id): r.n for r in spark.sql("SELECT * FROM csv_stream_t").collect()}
    batch = (
        spark.read.options(header=True).schema(schema).csv(str(src))
        .groupBy(F.window("ts", "30 minutes").alias("w"), "conv_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "conv_id", "n")
    )
    expect = {(r.ws, r.conv_id): r.n for r in batch.collect()}
    # append mode emits only windows closed by the final watermark; every
    # emitted window must match its batch twin, and most windows must emit
    assert got and all(expect[k] == v for k, v in got.items())


# -- MongoDB connector option mapping -----------------------------------------

def test_mongo_options_mapping():
    from pipeflow_spark import mongo_options

    opts = mongo_options(
        "mongodb://h:27017", "db", "coll",
        pipeline=[{"$match": {"age": {"$gt": 18}}}, {"$limit": 10}],
        batch_size=512,
    )
    assert opts["connection.uri"] == "mongodb://h:27017"
    assert opts["database"] == "db" and opts["collection"] == "coll"
    assert '"$match"' in opts["aggregation.pipeline"]
    assert opts["maxBatchSize"] == "512"


def test_mongo_read_raises_without_connector(spark):
    import pytest as _pytest

    from pipeflow_spark import read

    with _pytest.raises(Exception, match="(?i)mongodb|data.?source|failed to find"):
        read.mongodb(spark, "mongodb://h:27017", "db", "coll")


# -- ORC / text / Avro formats -------------------------------------------------

def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from pipeflow_spark import read
    from pipeflow_spark.sinks import write

    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    path = str(tmp_path / "nation_orc")
    write.orc(src, path)
    back = read.orc(spark, path).df
    assert sorted(back.collect()) == sorted(src.collect())
    assert back.schema == src.schema
    # columnar scan: filter pushes into the ORC reader like parquet
    plan = back.filter(back.n_regionkey == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_regionkey" in plan.split("PushedFilters")[1][:120]


def test_text_roundtrip(spark, tmp_path):
    from pipeflow_spark import read
    from pipeflow_spark.sinks import write
    from pyspark.sql import functions as F

    src = spark.createDataFrame([("line one",), ("line two",), ("line three",)], "value string")
    path = str(tmp_path / "txt")
    write.text(src, path)
    back = read.text(spark, path).df
    assert sorted(r.value for r in back.collect()) == ["line one", "line three", "line two"]


def test_avro_works_without_jar(spark, tmp_path):
    """r2 gated this surface on the spark-avro jar; r3 closed the gap with
    the stdlib OCF codec, so the fluent path now round-trips jar-free
    (full coverage in tests/test_avro.py)."""
    from pipeflow_spark import read
    from pipeflow_spark.sinks import write

    df = spark.range(3)
    write.avro(df, str(tmp_path / "a"))
    assert sorted(r.id for r in read.avro(spark, str(tmp_path / "a")).df.collect()) == [0, 1, 2]


def test_csv_quarantine_splits_clean_and_malformed(spark, tmp_path):
    """Malformed rows (wrong arity / unparseable types) land verbatim in the
    quarantine; clean rows parse typed; the two partitions cover the file."""
    from pipeflow_spark import read
    from pyspark.sql import types as T

    src = tmp_path / "in.csv"
    src.write_text(
        "id,ts,amount\n"
        "1,2024-01-01T00:00:00,10.5\n"
        "2,not-a-timestamp,3.25\n"      # bad type -> corrupt
        "3,2024-02-01T00:00:00,7.0\n"
    )
    schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("amount", T.DoubleType()),
    ])
    qdir = str(tmp_path / "quarantine")
    p = read.csv_quarantine(spark, str(src), schema, qdir)
    good = p.to_list()
    assert sorted(r["id"] for r in good) == [1, 3]
    assert all(r["ts"] is not None for r in good)
    bad = spark.read.json(qdir).collect()
    assert len(bad) == 1 and "not-a-timestamp" in bad[0].raw


def test_csv_quarantine_requires_struct_schema(spark, tmp_path):
    import pytest as _pytest

    from pipeflow_spark import read

    with _pytest.raises(ValueError, match="StructType"):
        read.csv_quarantine(spark, str(tmp_path / "x.csv"), "id int", str(tmp_path / "q"))

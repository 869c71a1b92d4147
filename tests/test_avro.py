"""Stdlib Avro OCF codec — round-trips, codecs, splittable read, and a
hand-built golden file that validates the decoder independently of the
encoder (no avro library exists in this container to cross-check against,
so the golden bytes are written out longhand from the Avro 1.11 spec)."""

import datetime
import decimal
import os
import struct
import zlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeflow_spark import avro_py, read
from pipeflow_spark.sinks import write
from pipeflow_spark.avro_py import (
    avro_schema_of,
    decode_container,
    parse_header,
    read_avro,
    spark_to_avro_schema,
    split_plan_size,
    write_avro,
)


def _sorted_rows(df, *keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


# ---------------------------------------------------------------------------
# golden bytes: decoder vs a file built by hand from the spec
# ---------------------------------------------------------------------------

def _zz(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_golden_handwritten_file_decodes():
    schema_json = (
        b'{"type": "record", "name": "r", "fields": ['
        b'{"name": "id", "type": "long"}, '
        b'{"name": "name", "type": ["null", "string"]}, '
        b'{"name": "score", "type": "double"}]}'
    )
    sync = bytes(range(16))
    buf = bytearray()
    buf += b"Obj\x01"
    buf += _zz(2)  # two metadata entries
    for k, v in ((b"avro.codec", b"null"), (b"avro.schema", schema_json)):
        buf += _zz(len(k)) + k + _zz(len(v)) + v
    buf += _zz(0)
    buf += sync
    # one block, two rows
    body = bytearray()
    body += _zz(7)  # id = 7
    body += _zz(1) + _zz(5) + b"alice"  # union branch 1 (string), len 5
    body += struct.pack("<d", 2.5)
    body += _zz(-3)  # id = -3 (zigzag negative path)
    body += _zz(0)  # union branch 0 (null)
    body += struct.pack("<d", -0.25)
    buf += _zz(2) + _zz(len(body)) + bytes(body) + sync

    avsc, rows = decode_container(bytes(buf))
    assert rows == [
        {"id": 7, "name": "alice", "score": 2.5},
        {"id": -3, "name": None, "score": -0.25},
    ]


def test_golden_deflate_block_decodes():
    schema_json = b'{"type": "record", "name": "r", "fields": [{"name": "v", "type": "int"}]}'
    sync = b"\xaa" * 16
    buf = bytearray(b"Obj\x01")
    buf += _zz(2)
    for k, v in ((b"avro.codec", b"deflate"), (b"avro.schema", schema_json)):
        buf += _zz(len(k)) + k + _zz(len(v)) + v
    buf += _zz(0) + sync
    body = _zz(100) + _zz(-100)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    data = co.compress(bytes(body)) + co.flush()
    buf += _zz(2) + _zz(len(data)) + data + sync
    _, rows = decode_container(bytes(buf))
    assert [r["v"] for r in rows] == [100, -100]


# ---------------------------------------------------------------------------
# schema mapping
# ---------------------------------------------------------------------------

def test_schema_mapping_round_trip():
    st = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), False),
            T.StructField("c", T.ArrayType(T.FloatType(), False), True),
            T.StructField("d", T.MapType(T.StringType(), T.IntegerType(), True), True),
            T.StructField("e", T.TimestampType(), True),
            T.StructField("f", T.DateType(), True),
            T.StructField(
                "g",
                T.StructType([T.StructField("x", T.DoubleType(), True)]),
                True,
            ),
            T.StructField("h", T.DecimalType(10, 2), True),
            T.StructField("i", T.BinaryType(), True),
            T.StructField("j", T.BooleanType(), False),
        ]
    )
    back = avro_py.avro_to_spark_schema(spark_to_avro_schema(st))
    assert back == st


# ---------------------------------------------------------------------------
# Spark round-trips
# ---------------------------------------------------------------------------

def test_all_types_round_trip(spark, tmp_path):
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("s", T.StringType(), True),
            T.StructField("f32", T.FloatType(), True),
            T.StructField("arr", T.ArrayType(T.FloatType(), False), True),
            T.StructField("m", T.MapType(T.StringType(), T.LongType(), False), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("d", T.DateType(), True),
            T.StructField(
                "rec",
                T.StructType(
                    [
                        T.StructField("x", T.DoubleType(), True),
                        T.StructField("y", T.StringType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("dec", T.DecimalType(12, 3), True),
            T.StructField("bin", T.BinaryType(), True),
            T.StructField("flag", T.BooleanType(), True),
        ]
    )
    rows = [
        (
            1,
            "héllo",
            1.5,
            [0.5, -2.0],
            {"k1": 10, "k2": -3},
            datetime.datetime(2026, 8, 19, 12, 34, 56, 789012),
            datetime.date(2026, 8, 19),
            (3.25, "inner"),
            decimal.Decimal("12345.678"),
            b"\x00\xffbytes",
            True,
        ),
        (2, None, None, None, None, None, None, None, None, None, None),
        (
            3,
            "",
            -0.0,
            [],
            {},
            datetime.datetime(1969, 12, 31, 23, 59, 59),
            datetime.date(1969, 7, 20),
            (None, None),
            decimal.Decimal("-0.001"),
            b"",
            False,
        ),
    ]
    df = spark.createDataFrame(rows, st)
    out = str(tmp_path / "all_types")
    write_avro(df, out, codec="deflate")
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = read_avro(spark, out)
    assert back.schema == st
    assert _sorted_rows(back, "id") == _sorted_rows(df, "id")


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_codecs_round_trip(spark, tmp_path, codec):
    df = spark.range(0, 1000).withColumn("s", F.concat(F.lit("row-"), F.col("id")))
    out = str(tmp_path / ("codec_" + codec))
    write_avro(df, out, codec=codec)
    back = read_avro(spark, out)
    assert back.count() == 1000
    assert _sorted_rows(back, "id") == _sorted_rows(df, "id")


def test_testdata_tables_round_trip(spark, sf_dir, tmp_path):
    """events (timestamp + double) and embeddings (array<float>) — the
    repo's own tables survive the OCF round-trip exactly."""
    for table, key in (("events", "event_id"), ("embeddings", "vec_id")):
        df = spark.read.parquet(os.path.join(sf_dir, table + ".parquet"))
        out = str(tmp_path / ("rt_" + table))
        write_avro(df, out)
        back = read_avro(spark, out)
        assert back.schema == df.schema
        assert _sorted_rows(back, key) == _sorted_rows(df, key)


def test_write_distributes_one_file_per_partition(spark, tmp_path):
    df = spark.range(0, 400).repartition(4)
    out = str(tmp_path / "parts")
    report = write_avro(df, out)
    parts = sorted(f for f in os.listdir(out) if f.endswith(".avro"))
    assert len(parts) == 4
    assert sum(r["rows"] for r in report) == 400


def test_split_read_fans_out_and_matches(spark, tmp_path):
    """One single-partition file, read with a small split size: the range
    plan fans out to many tasks yet yields exactly the same rows."""
    df = spark.range(0, 20000).withColumn(
        "pad", F.concat(F.lit("x" * 50), F.col("id"))
    ).coalesce(1)
    out = str(tmp_path / "bigfile")
    write_avro(df, out, codec="null", rows_per_block=512)
    n_tasks = split_plan_size(out, split_mb=0.1)
    assert n_tasks > 3  # genuinely split
    back = read_avro(spark, out, split_mb=0.1)
    assert back.count() == 20000
    assert _sorted_rows(back, "id") == _sorted_rows(df, "id")
    # every block decoded exactly once: no dupes, no gaps
    ids = [r[0] for r in back.select("id").distinct().collect()]
    assert len(ids) == 20000


def test_split_read_matches_whole_file_read(spark, tmp_path):
    df = spark.range(0, 5000).withColumn("v", F.col("id") * 2).coalesce(1)
    out = str(tmp_path / "split_eq")
    write_avro(df, out, codec="deflate", rows_per_block=256)
    whole = _sorted_rows(read_avro(spark, out), "id")
    split = _sorted_rows(read_avro(spark, out, split_mb=0.05), "id")
    assert whole == split


def test_fluent_surface_falls_back_without_jar(spark, tmp_path):
    """`sinks.avro` / `read.avro` transparently use the stdlib codec when
    the spark-avro jar is absent (this sandbox)."""
    df = spark.range(0, 50).withColumn("s", F.col("id").cast("string"))
    out = str(tmp_path / "fluent")
    write.avro(df, out)
    pipe = read.avro(spark, out)
    assert _sorted_rows(pipe.df, "id") == _sorted_rows(df, "id")


def test_header_parse_and_schema_of(spark, tmp_path):
    df = spark.range(0, 10)
    out = str(tmp_path / "hdr")
    write_avro(df, out, codec="deflate")
    part = os.path.join(out, sorted(f for f in os.listdir(out) if f.endswith(".avro"))[0])
    with open(part, "rb") as f:
        avsc, codec, sync, hlen = parse_header(f.read())
    assert codec == "deflate"
    assert len(sync) == 16
    assert avsc["type"] == "record"
    assert avro_schema_of(out) == df.schema


def test_writer_rejects_unsupported_codec(spark):
    with pytest.raises(ValueError):
        write_avro(spark.range(1), "/tmp/never", codec="snappy")


# ---------------------------------------------------------------------------
# post-review hardening: precision, nesting, NaN-vs-null, modes, ranged I/O
# ---------------------------------------------------------------------------

def test_decimal_precision_38_exact(spark, tmp_path):
    """precision > 28 must not round through the default decimal context."""
    st = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("d", T.DecimalType(38, 4), True),
    ])
    big = decimal.Decimal("9999999999999999999999999999999999.9999")
    neg = decimal.Decimal("-1234567890123456789012345678901234.5678")
    df = spark.createDataFrame([(1, big), (2, neg), (3, None)], st)
    out = str(tmp_path / "dec38")
    write_avro(df, out)
    back = read_avro(spark, out)
    assert back.schema == st
    assert _sorted_rows(back, "id") == _sorted_rows(df, "id")


def test_nested_temporals_round_trip(spark, tmp_path):
    """timestamps/dates inside structs and arrays must convert, not crash
    (pre-fix: only top-level columns were converted to epoch units)."""
    st = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("ev", T.StructType([
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("day", T.DateType(), True),
        ]), True),
        T.StructField("times", T.ArrayType(T.TimestampType(), True), True),
    ])
    t0 = datetime.datetime(2026, 1, 2, 3, 4, 5, 678901)
    t1 = datetime.datetime(1969, 12, 31, 23, 59, 59, 1)
    rows = [
        (1, (t0, datetime.date(2026, 1, 2)), [t0, t1, None]),
        (2, (None, None), []),
        (3, None, None),
    ]
    df = spark.createDataFrame(rows, st)
    out = str(tmp_path / "nested_ts")
    write_avro(df, out)
    back = read_avro(spark, out)
    assert back.schema == st
    assert _sorted_rows(back, "id") == _sorted_rows(df, "id")


def test_nan_distinct_from_null(spark, tmp_path):
    """float NaN is a VALUE in Avro (and in spark-avro); null is absence.
    The Arrow kernels keep them distinct where the pandas hop could not."""
    st = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("x", T.DoubleType(), True),
    ])
    df = spark.createDataFrame([(1, float("nan")), (2, None), (3, 2.5)], st)
    out = str(tmp_path / "nan_null")
    write_avro(df, out, codec="null")
    back = read_avro(spark, out).orderBy("id").collect()
    import math
    assert math.isnan(back[0]["x"])
    assert back[1]["x"] is None
    assert back[2]["x"] == 2.5


def test_write_modes(spark, tmp_path):
    out = str(tmp_path / "modes")
    df1 = spark.range(0, 10).coalesce(1)
    df2 = spark.range(100, 105).coalesce(1)
    write_avro(df1, out)
    # append adds a generation, never clobbers the first write
    write_avro(df2, out, mode="append")
    back = read_avro(spark, out)
    assert back.count() == 15
    ids = sorted(r["id"] for r in back.collect())
    assert ids == list(range(0, 10)) + list(range(100, 105))
    with pytest.raises(FileExistsError):
        write_avro(df1, out, mode="error")
    assert write_avro(df1, out, mode="ignore") == []
    assert read_avro(spark, out).count() == 15  # ignore wrote nothing
    write_avro(df2, out, mode="overwrite")
    assert read_avro(spark, out).count() == 5


def test_fixed_decimal_decodes_as_decimal():
    """spec-legal decimal-over-fixed from an external writer → Decimal,
    matching the DecimalType the schema mapper declares."""
    schema_json = (
        b'{"type": "record", "name": "r", "fields": ['
        b'{"name": "amt", "type": {"type": "fixed", "name": "f8", "size": 8, '
        b'"logicalType": "decimal", "precision": 18, "scale": 2}}]}'
    )
    sync = b"\x5a" * 16
    buf = bytearray(b"Obj\x01")
    buf += _zz(2)
    for k, v in ((b"avro.codec", b"null"), (b"avro.schema", schema_json)):
        buf += _zz(len(k)) + k + _zz(len(v)) + v
    buf += _zz(0) + sync
    body = (12345).to_bytes(8, "big", signed=True)  # 123.45
    buf += _zz(1) + _zz(len(body)) + bytes(body) + sync
    avsc, rows = decode_container(bytes(buf))
    assert rows == [{"amt": decimal.Decimal("123.45")}]
    st = avro_py.avro_to_spark_schema(avsc)
    assert st["amt"].dataType == T.DecimalType(18, 2)


def test_timestamps_encode_as_true_utc_micros():
    """tz-aware input under ANY zone lands as the same UTC epoch micros;
    the decoder hands back tz-aware UTC datetimes (spec interop, not a
    session-relative round-trip that would mask a zone offset)."""
    est = datetime.timezone(datetime.timedelta(hours=-5))
    aware = datetime.datetime(2026, 3, 1, 7, 30, 0, 250000, tzinfo=est)
    same_utc = datetime.datetime(2026, 3, 1, 12, 30, 0, 250000,
                                 tzinfo=datetime.timezone.utc)
    assert avro_py._micros(aware) == avro_py._micros(same_utc)
    assert avro_py._micros(aware) == int(aware.timestamp() * 1_000_000)


def test_ranged_decode_matches_whole_and_bounds_io(spark, tmp_path):
    """_decode_ranged over a partition of [0, size) reproduces the whole
    file exactly — and each call touches only its slice (+ overhang)."""
    df = spark.range(0, 8000).withColumn("s", F.col("id").cast("string")).coalesce(1)
    out = str(tmp_path / "ranged")
    write_avro(df, out, codec="deflate", rows_per_block=128)
    part = os.path.join(out, sorted(f for f in os.listdir(out) if f.endswith(".avro"))[0])
    size = os.path.getsize(part)
    with open(part, "rb") as f:
        _, whole = decode_container(f.read())
    step = max(1, size // 7)
    pieced = []
    for s in range(0, size, step):
        pieced.extend(avro_py._decode_ranged(part, s, min(s + step, size)))
    assert sorted(r["id"] for r in pieced) == sorted(r["id"] for r in whole)
    assert len(pieced) == len(whole) == 8000


def test_jar_missing_narrow():
    """only the data-source-not-found failure reroutes to the fallback —
    errors merely MENTIONING avro (e.g. a path) must propagate."""
    assert avro_py.jar_missing(Exception(
        "[DATA_SOURCE_NOT_FOUND] Failed to find the data source: avro."))
    assert not avro_py.jar_missing(Exception(
        "Path does not exist: file:/data/avro/events"))
    assert not avro_py.jar_missing(Exception(
        "Cannot convert SQL type INTERVAL to Avro type"))


def test_read_options_rejected_not_dropped(spark, tmp_path):
    """options the stdlib fallback cannot honor raise instead of silently
    vanishing (pre-fix: **options were discarded)."""
    df = spark.range(0, 5)
    out = str(tmp_path / "optrej")
    write_avro(df, out)
    with pytest.raises(ValueError, match="reader options"):
        read.avro(spark, out, recursiveFileLookup="true")

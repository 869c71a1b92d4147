"""Ports of the reference cloud/connector test files:

* ``PipeFlow.Tests/CloudTests.cs`` — S3/Azure/GCS constructor validation,
  fluent chaining returns self, builder entry points exist.
* ``PipeFlow.Tests/MongoDbTests.cs:14-99`` — Mongo reader/writer argument
  validation and option chaining.
* ``PipeFlow.Tests/ApiReaderGenericTests.cs`` — the retry terminal
  behaviors: exhausted non-success responses → default/empty (no throw),
  exhausted transport exceptions → "Failed to fetch"; null URL → throws.

Plus what the reference *cannot* test single-node: the identical cloud
code path run end-to-end through the local filesystem (``scheme="file"``),
proving the URI → distributed reader/writer plumbing works, not just the
option mapping.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pipeflow_spark import Pipeline, mongo_options, read
from pipeflow_spark.cloud import (
    AzureBlobReader,
    AzureBlobWriter,
    GoogleCloudStorageReader,
    GoogleCloudStorageWriter,
    S3Reader,
    S3Writer,
    to_s3_csv,
)
from pipeflow_spark.rest import fetch_api_rows, fetch_with_retry


# --- CloudTests.cs: constructor validation -------------------------------


@pytest.mark.parametrize("bucket,key", [(None, "k"), ("b", None), ("", "k"), ("b", "")])
def test_s3_reader_rejects_null_args(bucket, key):
    """CloudTests.cs:15-29 (S3Reader) and :47-55 (S3Writer)."""
    with pytest.raises(ValueError):
        S3Reader(bucket, key)
    with pytest.raises(ValueError):
        S3Writer(bucket, key)


@pytest.mark.parametrize(
    "conn,container,blob",
    [(None, "c", "b"), ("cs", None, "b"), ("cs", "c", None)],
)
def test_azure_reader_rejects_null_args(conn, container, blob):
    """CloudTests.cs:61-83."""
    with pytest.raises(ValueError):
        AzureBlobReader(conn, container, blob)
    with pytest.raises(ValueError):
        AzureBlobWriter(conn, container, blob)


@pytest.mark.parametrize("bucket,obj", [(None, "o"), ("b", None)])
def test_gcs_reader_rejects_null_args(bucket, obj):
    """CloudTests.cs:117-131."""
    with pytest.raises(ValueError):
        GoogleCloudStorageReader(bucket, obj)
    with pytest.raises(ValueError):
        GoogleCloudStorageWriter(bucket, obj)


# --- CloudTests.cs: fluent chaining returns self --------------------------


def test_s3_chained_methods_return_self():
    """CloudTests.cs:36-44."""
    r = S3Reader("test-bucket", "test.csv")
    assert r.with_region("us-west-2").with_credentials("access", "secret") is r
    assert r.uri() == "s3a://test-bucket/test.csv"
    opts = r.hadoop_options()
    assert opts["fs.s3a.bucket.test-bucket.access.key"] == "access"
    assert opts["fs.s3a.bucket.test-bucket.secret.key"] == "secret"
    assert opts["fs.s3a.bucket.test-bucket.endpoint.region"] == "us-west-2"


def test_azure_writer_chained_methods_return_self():
    """CloudTests.cs:104-114."""
    w = AzureBlobWriter(
        "DefaultEndpointsProtocol=https;AccountName=acct;AccountKey=s3cret",
        "container",
        "blob.csv",
    )
    assert w.with_access_tier("Cool").with_overwrite(False) is w
    assert w.uri() == "abfss://container@acct.dfs.core.windows.net/blob.csv"
    assert w.hadoop_options() == {"fs.azure.account.key.acct.dfs.core.windows.net": "s3cret"}
    # classic blob endpoint (what the reference SDK targets)
    w2 = AzureBlobReader(
        "AccountName=acct;AccountKey=k", "c", "b.csv", protocol="wasbs"
    )
    assert w2.uri() == "wasbs://c@acct.blob.core.windows.net/b.csv"


def test_gcs_writer_chained_methods_return_self():
    """CloudTests.cs:150-160."""
    w = GoogleCloudStorageWriter("bucket", "object")
    assert (
        w.with_project_id("my-project").with_storage_class("NEARLINE").with_metadata("k", "v")
        is w
    )
    assert w.uri() == "gs://bucket/object"
    assert w.hadoop_options()["fs.gs.project.id"] == "my-project"


def test_builder_entry_points_exist():
    """CloudTests.cs:163-190 — S3Csv/AzureBlobCsv/GoogleCloudCsv exist on
    the builder."""
    assert callable(read.s3_csv)
    assert callable(read.azure_blob_csv)
    assert callable(read.gcs_csv)


# --- end-to-end through the identical code path (scheme="file") ----------


def test_s3_csv_local_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    to_s3_csv(df, str(tmp_path), "out", scheme="file")
    back = read.s3_csv(spark, str(tmp_path), "out", scheme="file")
    assert isinstance(back, Pipeline)
    assert sorted((r.id, r.name) for r in back.df.collect()) == [(1, "a"), (2, "b")]


def test_azure_blob_csv_local_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(7, "x")], "id int, name string")
    AzureBlobWriter("AccountName=a;AccountKey=k", str(tmp_path), "blob", protocol="file").save_csv(df)
    back = read.azure_blob_csv(
        spark, "AccountName=a;AccountKey=k", str(tmp_path), "blob", protocol="file"
    )
    assert [(r.id, r.name) for r in back.df.collect()] == [(7, "x")]


# --- MongoDbTests.cs:14-99 ------------------------------------------------


@pytest.mark.parametrize(
    "uri,db,coll",
    [(None, "d", "c"), ("mongodb://h", None, "c"), ("mongodb://h", "d", None)],
)
def test_mongo_options_reject_null_args(uri, db, coll):
    with pytest.raises(ValueError):
        mongo_options(uri, db, coll)


def test_mongo_options_chaining_surface():
    """MongoDbTests.cs:41-53 / :86-97 — the reader pushdown DSL and writer
    config compile into connector options."""
    opts = mongo_options(
        "mongodb://localhost",
        "testdb",
        "users",
        pipeline=[{"$match": {"status": "active"}}, {"$limit": 10}],
        batch_size=500,
        ordered="false",
    )
    assert opts["connection.uri"] == "mongodb://localhost"
    assert json.loads(opts["aggregation.pipeline"])[1] == {"$limit": 10}
    assert opts["maxBatchSize"] == "500"


# --- ApiReaderGenericTests.cs terminal behaviors --------------------------


class _StatusHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        self.server.hits += 1
        body = b'{"data": []}'
        status = 500 if self.path.startswith("/always500") else 200
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def status_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StatusHandler)
    srv.hits = 0
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", srv
    srv.shutdown()


def test_fetch_null_url_throws():
    """ApiReaderGenericTests.cs:97-101 (Constructor_NullUrl_Throws)."""
    with pytest.raises(ValueError):
        fetch_with_retry(None)
    with pytest.raises(ValueError):
        fetch_api_rows("")


def test_retry_exhausted_on_unsuccessful_responses_returns_default(status_server):
    """ApiReaderGenericTests.cs:208-224: all-5xx → default (empty), no
    throw, exactly max_retries requests."""
    base, srv = status_server
    assert fetch_with_retry(f"{base}/always500", max_retries=2, retry_delay=0) is None
    assert srv.hits == 2
    assert fetch_api_rows(f"{base}/always500", max_retries=2, retry_delay=0) == []


def test_retry_exhausted_on_transport_exception_raises():
    """ApiReaderGenericTests.cs:226-241: exceptions → 'Failed to fetch'."""
    with pytest.raises(RuntimeError, match="Failed to fetch"):
        # closed port → connection refused on every attempt
        fetch_with_retry("http://127.0.0.1:9/none", max_retries=2, retry_delay=0)

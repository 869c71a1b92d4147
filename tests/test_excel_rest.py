"""Excel (xlsx) + REST API source/sink parity.

Reference behavior under test: ExcelReader.cs:61-163 (sheet select, header
synthesis, Range, typed cells, empty-row skip), ExcelWriter.cs:58-197
(header row, canonical datetime text), ApiReader.cs:54-233 (pagination,
retry, envelope detection, nested-value flattening), ApiWriter.cs:62-142
(batched JSON requests).
"""

import datetime as dt
import json
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pipeflow_spark.excel import parse_xlsx, read_excel, write_excel
from pipeflow_spark.rest import (
    fetch_api_rows,
    read_api,
    read_api_partitioned,
    rows_from_json,
    write_api,
)

# -- Excel -------------------------------------------------------------------


def _mixed_df(spark):
    return spark.createDataFrame(
        [
            (1, 1.5, True, "alpha", dt.datetime(2024, 1, 2, 3, 4, 5)),
            (2, 2.25, False, "beta <&> \"q\"", dt.datetime(2024, 6, 7, 8, 9, 10)),
        ],
        "id long, score double, flag boolean, name string, ts timestamp",
    )


def test_excel_roundtrip_typed_cells(spark, tmp_path):
    """Writer cell typing (ExcelWriter.cs:155-197) survives the reader's
    GetCellValue ladder (ExcelReader.cs:131-163): integral numbers come back
    int, doubles double, bools bool, datetimes canonical text."""
    path = str(tmp_path / "mixed.xlsx")
    write_excel(_mixed_df(spark), path)
    out = read_excel(spark, path).orderBy("id").collect()
    assert [r.id for r in out] == [1, 2]
    assert [r.score for r in out] == [1.5, 2.25]
    assert [r.flag for r in out] == [True, False]
    assert out[1]["name"] == 'beta <&> "q"'  # XML escaping roundtrips
    assert out[0]["ts"] == "2024-01-02 03:04:05"  # canonical datetime text


def test_excel_headerless_and_range(spark, tmp_path):
    path = str(tmp_path / "r.xlsx")
    write_excel(_mixed_df(spark).select("id", "name"), path, headers=False)
    names, rows = parse_xlsx(open(path, "rb").read(), headers=False)
    assert names == ["Column1", "Column2"]  # ExcelReader.cs:100-105
    assert rows[0]["Column1"] == 1
    # Range: start at the second data row, second column (ExcelReader.cs:50-58)
    _, ranged = parse_xlsx(open(path, "rb").read(), headers=False, start_row=2, start_col=2)
    assert [r["Column1"] for r in ranged] == [_mixed_df(spark).collect()[1]["name"]]


def test_excel_blank_header_synthesis_and_shared_strings(tmp_path):
    """Blank header cell → Column{i} (ExcelReader.cs:89-93); shared-string
    cells (t="s") resolve through xl/sharedStrings.xml; empty rows skipped."""
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'  # B1 header blank
        '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>7</v></c></row>'
        '<row r="3"/>'
        '<row r="4"><c r="A4" t="s"><v>2</v></c><c r="B4"><v>8.5</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<si><t>label</t></si><si><t>x</t></si>"
        "<si><r><t>y</t></r><r><t>z</t></r></si></sst>"  # rich-text runs concatenate
    )
    wb = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    p = tmp_path / "hand.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", shared)
    names, rows = parse_xlsx(p.read_bytes(), sheet="Data")
    assert names == ["label", "Column2"]
    assert rows == [{"label": "x", "Column2": 7}, {"label": "yz", "Column2": 8.5}]


def test_excel_append_mode(spark, tmp_path):
    """WithAppend (ExcelWriter.cs:75-90): rows continue after the last used
    row, header written only once; glob-vs-file dispatch uses the filesystem."""
    path = str(tmp_path / "log.xlsx")
    df = _mixed_df(spark).select("id", "name")
    write_excel(df, path)
    write_excel(df.withColumn("id", df.id + 10), path, append=True)
    out = read_excel(spark, path).orderBy("id").collect()
    assert [r.id for r in out] == [1, 2, 11, 12]
    assert out[0]["name"] == "alpha"


def test_excel_styled_header_autofit_and_table(spark, tmp_path):
    """Writer fidelity (ExcelWriter.cs:97,113-124): bold header style,
    autofit column widths, and a real OOXML table part over the data range —
    and the styled file still round-trips through the reader."""
    import zipfile as _zf

    path = str(tmp_path / "styled.xlsx")
    df = _mixed_df(spark).select("id", "name")
    write_excel(df, path, create_table=True)
    with _zf.ZipFile(path) as z:
        names = set(z.namelist())
        assert "xl/styles.xml" in names and "xl/tables/table1.xml" in names
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
        table = z.read("xl/tables/table1.xml").decode()
        ct = z.read("[Content_Types].xml").decode()
    assert '<c r="A1" s="1"' in sheet  # header cell carries the bold style
    assert "<cols>" in sheet and 'customWidth="1"' in sheet  # autofit widths
    # widest name value is 'beta <&> "q"' (12 chars) + 2 margin
    assert '<col min="2" max="2" width="14"' in sheet
    assert 'ref="A1:B3"' in table and 'name="TableStyleMedium2"' in table
    assert "spreadsheetml.table+xml" in ct
    out = read_excel(spark, path).orderBy("id").collect()
    assert [r.id for r in out] == [1, 2]
    # append mode skips table creation like the reference (_createTable && !_append)
    write_excel(df, path, append=True, create_table=True)
    with _zf.ZipFile(path) as z:
        assert "xl/tables/table1.xml" not in set(z.namelist())
    assert read_excel(spark, path).count() == 4


def test_json_document_append_merges(spark, tmp_path):
    """JsonWriter.cs:62-71 read-merge-rewrite: appending to an array document
    parses the old array and rewrites the whole file."""
    import json as _json

    from pipeflow_spark.sinks import collect_json_document

    path = str(tmp_path / "doc.json")
    a = spark.createDataFrame([(1, "a")], "id long, v string")
    b = spark.createDataFrame([(2, "b")], "id long, v string")
    collect_json_document(a, path)
    collect_json_document(b, path, append=True)
    doc = _json.load(open(path))
    assert doc == [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]
    # non-array document refuses rather than corrupting
    bad = str(tmp_path / "obj.json")
    open(bad, "w").write('{"not": "an array"}')
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a JSON array"):
        collect_json_document(b, bad, append=True)


def test_excel_directory_distributed_read(spark, tmp_path):
    """Glob of xlsx → binaryFile + mapInPandas: executors parse in parallel."""
    for i in range(3):
        df = spark.createDataFrame([(i, f"doc{i}")], "id long, name string")
        write_excel(df, str(tmp_path / f"part{i}.xlsx"))
    from pyspark.sql import types as T

    out = read_excel(
        spark,
        str(tmp_path),
        schema=T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
        ),
    )
    assert sorted((r.id, r.name) for r in out.collect()) == [
        (0, "doc0"), (1, "doc1"), (2, "doc2"),
    ]
    with pytest.raises(ValueError):
        read_excel(spark, str(tmp_path))  # directory requires explicit schema


# -- REST API ----------------------------------------------------------------


class _ApiHandler(BaseHTTPRequestHandler):
    """Paginated /items, flaky /flaky (fails twice per server), POST /sink."""

    server_version = "test"
    ITEMS = [{"id": i, "name": f"n{i}", "meta": {"k": i}} for i in range(1, 11)]

    def log_message(self, *a):  # silence
        pass

    def _reply(self, obj, status=200):
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        from urllib.parse import parse_qs, urlparse

        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        if u.path == "/items":
            page, size = int(q.get("page", 1)), int(q.get("pageSize", 100))
            rows = self.ITEMS[(page - 1) * size : page * size]
            self._reply({"data": rows})
        elif u.path == "/flat":
            self._reply(self.ITEMS[:2])
        elif u.path == "/echo":
            self._reply([{"x_custom": self.headers.get("X-Custom", "")}])
        elif u.path == "/flaky":
            self.server.flaky_hits += 1
            if self.server.flaky_hits <= 2:
                self._reply({"error": "boom"}, status=500)
            else:
                self._reply({"results": [{"ok": True, "auth": self.headers.get("Authorization", "")}]})
        else:
            self._reply({}, status=404)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        with self.server.lock:
            self.server.posts.append(payload)
            self.server.methods.append(self.command)
        self._reply({"ok": True})

    do_PUT = do_POST


@pytest.fixture(scope="module")
def api_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ApiHandler)
    srv.flaky_hits = 0
    srv.posts = []
    srv.methods = []
    srv.lock = threading.Lock()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", srv
    srv.shutdown()


def test_api_pagination_stops_at_empty_page(api_server):
    """ApiReader.cs:60-80: page from 1, append until an empty page."""
    base, _ = api_server
    rows = fetch_api_rows(f"{base}/items", page_size=4)
    assert [r["id"] for r in rows] == list(range(1, 11))  # 4+4+2, stop at page 4
    assert rows[0]["meta"] == '{"k": 1}'  # nested object → JSON text (cs:226-229)


def test_api_envelope_detection():
    """ApiReader.ParseJson (cs:142-195): root array, data/results/items, single obj."""
    assert rows_from_json([{"a": 1}]) == [{"a": 1}]
    assert rows_from_json({"results": [{"a": [1, 2]}]}) == [{"a": "[1, 2]"}]
    assert rows_from_json({"items": [{"b": 2}]}) == [{"b": 2}]
    assert rows_from_json({"solo": 1}) == [{"solo": 1}]


def test_api_retry_and_auth(api_server):
    """FetchDataWithRetry (cs:96-141): linear backoff, Bearer header."""
    base, srv = api_server
    srv.flaky_hits = 0
    rows = fetch_api_rows(
        f"{base}/flaky", auth_token="tok123", max_retries=3, retry_delay=0.01
    )
    assert rows == [{"ok": True, "auth": "Bearer tok123"}]
    assert srv.flaky_hits == 3  # two 500s then success


def test_read_api_dataframe(spark, api_server):
    base, _ = api_server
    df = read_api(spark, f"{base}/flat")
    assert df.count() == 2 and set(df.columns) == {"id", "name", "meta"}


def test_read_api_partitioned_distributed(spark, api_server):
    """Known page range fans out across executor workers via mapInPandas."""
    from pyspark.sql import types as T

    base, _ = api_server
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    df = read_api_partitioned(
        spark, f"{base}/items", pages=4, page_size=3, schema=schema, parallelism=4
    )
    assert sorted(r.id for r in df.collect()) == list(range(1, 11))


def test_write_api_batched_from_partitions(spark, api_server):
    """ApiWriter batching (cs:80-99): batch>1 → JSON arrays of ≤batch rows;
    batch=1 → one object per request; issued from foreachPartition."""
    base, srv = api_server
    df = spark.createDataFrame([(i,) for i in range(7)], "v int").coalesce(1)
    srv.posts.clear()
    write_api(df, f"{base}/sink", batch_size=3)
    sizes = sorted(len(p) for p in srv.posts)
    assert sizes == [1, 3, 3]
    assert sorted(r["v"] for p in srv.posts for r in p) == list(range(7))

    srv.posts.clear()
    write_api(df.limit(2), f"{base}/sink", batch_size=1)
    assert all(isinstance(p, dict) for p in srv.posts)
    assert sorted(p["v"] for p in srv.posts) == [0, 1]


# -- ApiTests.cs parity ports -------------------------------------------------
# PipeFlow.Tests/ApiTests.cs: the builder-surface tests.  Our API is
# keyword-based rather than fluent, so each WithX setter maps to a kwarg;
# the parity claim is behavioral — each configured option must reach the
# wire, and the ctor null checks must throw.


def test_api_custom_header_reaches_wire(api_server):
    """ApiTests.cs:29-35 WithHeader / :127-136 chained config: a custom
    header must be sent on reads (verified by a live echo endpoint)."""
    base, _ = api_server
    rows = fetch_api_rows(f"{base}/echo", headers={"X-Custom": "Value"})
    assert rows == [{"x_custom": "Value"}]


def test_api_writer_method_put(spark, api_server):
    """ApiTests.cs:71-86 WithMethod(HttpMethod.Put): the configured verb is
    used for every request."""
    base, srv = api_server
    df = spark.createDataFrame([(1,), (2,)], "v int").coalesce(1)
    with srv.lock:
        srv.posts.clear()
        srv.methods.clear()
    write_api(df, f"{base}/sink", method="PUT", batch_size=10)
    assert srv.methods == ["PUT"]
    assert sorted(r["v"] for p in srv.posts for r in p) == [1, 2]


def test_api_writer_chained_configuration(spark, api_server):
    """ApiTests.cs:138-149 ApiWriter_ChainedConfiguration: auth + header +
    method + batch size + bulk endpoint all combine on one call."""
    base, srv = api_server
    df = spark.createDataFrame([(i,) for i in range(5)], "v int").coalesce(1)
    with srv.lock:
        srv.posts.clear()
        srv.methods.clear()
    write_api(
        df, f"{base}/sink", method="POST", batch_size=100, bulk=True,
        auth_token="api-key", headers={"X-Custom": "w"},
    )
    # bulk=True → exactly one request per partition with all 5 rows
    assert srv.methods == ["POST"] and len(srv.posts) == 1
    assert sorted(r["v"] for r in srv.posts[0]) == list(range(5))


@pytest.mark.parametrize("bad", [None, ""])
def test_api_reader_null_url_throws(bad):
    """ApiTests.cs:14-17 / :56-59 ctor null checks (reader and writer share
    the URL validation in fetch_with_retry)."""
    from pipeflow_spark.rest import fetch_with_retry

    with pytest.raises(ValueError):
        fetch_with_retry(bad, None, None, 1, 0.01)


def test_api_reader_invalid_url_raises_after_retries():
    """ApiTests.cs:151-160 ApiReader_InvalidUrl_ThrowsException: a
    non-resolvable URL exhausts retries and raises (transport errors raise;
    HTTP non-success returns default — CloudTests parity pins that half)."""
    with pytest.raises(Exception):
        fetch_api_rows("http://127.0.0.1:1/nope", max_retries=1, retry_delay=0.01)

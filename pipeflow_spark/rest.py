"""REST API source + sink — stdlib ``urllib`` implementation.

Reference analogs:

* ``ApiReader`` — ``PipeFlow/Api/ApiReader.cs:54-141``: GET with
  Bearer/custom auth + headers, retry with linear backoff
  (``delay * attempt``), page-parameter pagination that stops at the first
  empty page, JSON envelope detection (root array, or the first of
  ``data``/``results``/``items``), scalar coercion where nested
  arrays/objects flatten to their JSON text
  (``ApiReader.cs:196-233``).
* ``ApiWriter`` — ``PipeFlow/Api/ApiWriter.cs:62-142``: POST/PUT JSON,
  batched (``WithBatchSize``, batch=1 → one object per request, else an
  array per request), optional single bulk request.

Scale design: the eager reader is driver-side (same as the reference) and
fine for control-plane fetches.  The data-plane paths are distributed:

* :func:`read_api_partitioned` fans a *known* page range out across
  executors — each Python worker fetches and parses its own pages inside
  ``mapInPandas``, so ingest bandwidth scales with the cluster, not the
  driver.
* :func:`write_api` posts from ``foreachPartition`` — every partition
  streams its own batched requests concurrently; the driver never
  materializes the DataFrame.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

from pyspark.sql import DataFrame, SparkSession

_ENVELOPES = ("data", "results", "items")


def _coerce(value):
    """ApiReader.GetJsonValue (ApiReader.cs:211-233): scalars pass through,
    nested arrays/objects collapse to their JSON text."""
    if isinstance(value, (list, dict)):
        return json.dumps(value, separators=(", ", ": "))
    return value


def rows_from_json(payload) -> list[dict]:
    """Envelope detection per ApiReader.ParseJson (ApiReader.cs:142-195)."""
    if isinstance(payload, list):
        objs = payload
    elif isinstance(payload, dict):
        for key in _ENVELOPES:
            if isinstance(payload.get(key), list):
                objs = payload[key]
                break
        else:
            objs = [payload]
    else:
        return []
    return [{k: _coerce(v) for k, v in obj.items()} for obj in objs if isinstance(obj, dict)]


def _request(url: str, data: bytes | None, method: str, auth: str | None, headers: dict) -> bytes:
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    if auth:
        req.add_header("Authorization", auth)
    for k, v in headers.items():
        req.add_header(k, v)
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.read()


def fetch_with_retry(
    url: str,
    auth: str | None = None,
    headers: dict | None = None,
    max_retries: int = 3,
    retry_delay: float = 1.0,
    data: bytes | None = None,
    method: str = "GET",
) -> bytes | None:
    """Linear-backoff retry loop (ApiReader.FetchDataWithRetry,
    ApiReader.cs:96-141): sleep ``delay * attempt`` between attempts.

    Terminal behavior matches the reference exactly: a run that *ends* on a
    non-success HTTP response returns the default (``None`` here,
    ``Enumerable.Empty`` there — ApiReader.cs:139); a run that ends on a
    transport exception raises "Failed to fetch" (ApiReader.cs:128-135).
    """
    if not url:
        raise ValueError("url must be a non-empty string")  # ctor null check
    for attempt in range(1, max_retries + 1):
        try:
            return _request(url, data, method, auth, headers or {})
        except urllib.error.HTTPError as exc:  # reached server, non-2xx status
            exc.close()
            if attempt < max_retries:
                time.sleep(retry_delay * attempt)
        except (urllib.error.URLError, OSError) as exc:  # transport failure
            if attempt >= max_retries:
                raise RuntimeError(
                    f"Failed to fetch {url} after {max_retries} attempts"
                ) from exc
            time.sleep(retry_delay * attempt)
    return None


def _page_url(base: str, page: int, page_size: int, page_param: str, size_param: str) -> str:
    sep = "&" if "?" in base else "?"
    return f"{base}{sep}{page_param}={page}&{size_param}={page_size}"


def fetch_api_rows(
    url: str,
    auth_token: str | None = None,
    auth_scheme: str = "Bearer",
    headers: dict | None = None,
    max_retries: int = 3,
    retry_delay: float = 1.0,
    page_size: int | None = None,
    page_param: str = "page",
    size_param: str = "pageSize",
) -> list[dict]:
    """Eager fetch with reference pagination semantics
    (ApiReader.ReadAsync, ApiReader.cs:54-88): page from 1, stop at the
    first empty page; no pagination → single GET."""
    auth = f"{auth_scheme} {auth_token}" if auth_token else None
    rows: list[dict] = []
    if page_size is None:
        body = fetch_with_retry(url, auth, headers, max_retries, retry_delay)
        # None = retries exhausted on non-success responses → default/empty
        # (ApiReader.cs:139 returns Enumerable.Empty, never throws here)
        return rows_from_json(json.loads(body)) if body is not None else []
    page = 1
    while True:
        body = fetch_with_retry(
            _page_url(url, page, page_size, page_param, size_param),
            auth, headers, max_retries, retry_delay,
        )
        if body is None:
            return rows
        page_rows = rows_from_json(json.loads(body))
        if not page_rows:
            return rows
        rows.extend(page_rows)
        page += 1


def read_api(spark: SparkSession, url: str, schema=None, **options) -> DataFrame:
    """Driver-side API source → DataFrame (the reference's eager shape).
    ``options`` pass through to :func:`fetch_api_rows`."""
    rows = fetch_api_rows(url, **options)
    if schema is not None:
        names = [f.name for f in schema.fields]
        return spark.createDataFrame([[r.get(n) for n in names] for r in rows], schema)
    if not rows:
        raise ValueError("empty API response requires an explicit schema")
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in rows]))


def read_api_partitioned(
    spark: SparkSession,
    url: str,
    pages: int,
    page_size: int,
    schema,
    page_param: str = "page",
    size_param: str = "pageSize",
    auth_token: str | None = None,
    auth_scheme: str = "Bearer",
    headers: dict | None = None,
    max_retries: int = 3,
    retry_delay: float = 1.0,
    parallelism: int | None = None,
) -> DataFrame:
    """Distributed API ingest over a known page range [1, pages].

    Each executor worker fetches its own slice of pages inside
    ``mapInPandas`` — the scale path the reference's driver-side loop
    (ApiReader.cs:60-80) cannot take.  Requires an explicit ``schema``
    (remote JSON cannot be schema-inferred without fetching on the driver).
    """
    import pandas as pd

    auth = f"{auth_scheme} {auth_token}" if auth_token else None
    names = [f.name for f in schema.fields]

    def _fetch(batches):
        for pdf in batches:
            rows: list[dict] = []
            for page in pdf["page"]:
                body = fetch_with_retry(
                    _page_url(url, int(page), page_size, page_param, size_param),
                    auth, headers, max_retries, retry_delay,
                )
                rows.extend(rows_from_json(json.loads(body)))
            yield pd.DataFrame(
                {n: [r.get(n) for r in rows] for n in names}
                if rows else {n: [] for n in names}
            )

    page_df = spark.range(1, pages + 1).toDF("page")
    if parallelism:
        page_df = page_df.repartition(parallelism)
    return page_df.mapInPandas(_fetch, schema=schema)


def write_api(
    df: DataFrame,
    url: str,
    method: str = "POST",
    batch_size: int = 100,
    bulk: bool = False,
    auth_token: str | None = None,
    auth_scheme: str = "Bearer",
    headers: dict | None = None,
    max_retries: int = 3,
    retry_delay: float = 1.0,
) -> None:
    """Distributed API sink (ApiWriter.cs:62-142 semantics, executor-side).

    ``batch_size == 1`` → one JSON object per request; otherwise JSON arrays
    of ``batch_size`` rows.  ``bulk=True`` → one request per *partition*
    (the reference's single-request bulk mode, distributed).  Requests are
    issued from ``foreachPartition`` so throughput scales with partitions.
    """
    auth = f"{auth_scheme} {auth_token}" if auth_token else None
    names = df.columns
    hdrs = dict(headers or {})

    def _send(payload) -> None:
        fetch_with_retry(
            url, auth, hdrs, max_retries, retry_delay,
            data=json.dumps(payload, default=str).encode(), method=method,
        )

    def _post_partition(rows) -> None:
        batch: list[dict] = []
        limit = None if bulk else batch_size
        for row in rows:
            batch.append({n: row[n] for n in names})
            if limit == 1:
                _send(batch[0])
                batch.clear()
            elif limit is not None and len(batch) >= limit:
                _send(batch)
                batch.clear()
        if batch:
            _send(batch if (bulk or batch_size != 1) else batch[0])

    df.foreachPartition(_post_partition)

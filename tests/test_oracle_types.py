"""Oracle output-type gate (the r3 driver-mismatch root cause, pinned).

CORRECTNESS_r03 had exactly four hash-mismatch rows; all four — and only
those four among the 50-entry window — had DuckDB oracle output columns of
type HUGEINT (DuckDB promotes ``sum`` over INTEGER/BIGINT to int128).  A
harness that materializes DuckDB results through pandas/Arrow silently
converts int128 to float64/decimal ("1234.0" against Spark's "1234"), so the
value hash diverges while row counts and column names still match.  The fix
is ``CAST(... AS BIGINT)`` on every integer-sum output; this test keeps the
whole registry on pandas-safe DuckDB output types forever.

Runs on DuckDB alone (planning only, sf0.001 views) — no SparkSession.
"""

import duckdb
import pytest

from pipeflow_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# DuckDB output types that survive every materialization (fetchall, .df(),
# .arrow()) with a stringification identical to the matching Spark type.
PANDAS_SAFE = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT",
    "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN",
    "TIMESTAMP", "TIMESTAMP_NS", "DATE",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_pandas_lossy_oracle_output_types(con):
    offenders = []
    for name, (_fn, sql) in QUERIES.items():
        if sql is None:
            continue
        rel = con.sql(sql)  # binds/plans only; nothing is executed
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) not in PANDAS_SAFE:
                offenders.append((name, col, str(typ)))
    assert not offenders, (
        "oracle output columns with pandas-lossy DuckDB types (cast them, "
        f"e.g. CAST(sum(x) AS BIGINT)): {offenders}"
    )


def test_registry_window_is_50_and_leads_with_probes():
    names = list(QUERIES)
    assert len(names) >= 50
    assert names[:3] == ["probe_types_core", "probe_types_bool", "probe_types_numeric"]
    repaired = {
        "curate_training_corpus",
        "stream_budget_cap_oracle",
        "stream_turn_rate_spikes_oracle",
        "stream_curation_gate_oracle",
    }
    assert repaired <= set(names[:50]), "repaired r3 rows must stay inside the window"

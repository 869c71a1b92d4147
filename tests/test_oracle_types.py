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
    # r5 rotation: the 30 entries that had no driver CORRECTNESS row across
    # r1-r4 must all sit inside the certified window — green there closes
    # the ledger (every registry entry then has a driver row in some round)
    never_certified_r1_r4 = {
        "vocab_topk", "unigram_quality", "transform_dedupe_first",
        "time_window_counts", "distinct_users_exact", "approx_distinct_users",
        "multimodal_frame_sample", "stream_enrich_static_oracle",
        "stream_full_join_oracle", "session_dynamic_gap",
        "stream_events_session_dynamic_oracle", "stream_heavy_hitters_oracle",
        "stream_distinct_users_oracle", "stream_update_upsert_oracle",
        "stream_scd2_enrich_oracle", "stream_state_open_windows_oracle",
        "stream_join_replies_e2e", "stream_tumbling_e2e", "decontaminate_bloom",
        "stream_asof_attribution_oracle", "stream_window_median_oracle",
        "stream_decontaminate_oracle", "pattern_funnel_events",
        "stream_validate_dlq_oracle", "dedup_conversations",
        "stream_ivf_ingest_oracle", "stream_ivfpq_ingest_oracle",
        "stream_fanout_atomic_oracle", "reply_latency_profile",
        "range_shard_stats",
    }
    assert never_certified_r1_r4 <= set(names[:50]), (
        "every never-driver-certified entry must be inside the r5 window"
    )

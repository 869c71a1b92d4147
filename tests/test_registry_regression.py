"""Regression net for driver-certified queries that rotated OUT of the
certification window (VERDICT r3 #8).

The driver certifies only the first 50 registry entries each round; entries
certified in an earlier round then rely on session tooling.  This suite
re-runs every previously-driver-green query that now sits PAST the window
against its DuckDB oracle at sf0.001 (small enough to keep the whole sweep
in CI time), under the same dual normalization as ``tools/certify_all.py``
— so a regression in a rotated-out query fails pytest, not just a manual
sweep.

Streaming oracles are included: at sf0.001 each bounded replay completes in
a few seconds.
"""

import glob
import json
import os
import re
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracles import TABLES, canon, canon_pandas  # noqa: E402

from pipeflow_spark.queries import QUERIES  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def _rotated_out_certified() -> list[str]:
    """Queries with a green driver row in ANY recorded round that now sit
    past the 50-entry window (still registered, oracle-backed)."""
    certified: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") and row.get("rows_match"):
                    certified.add(name)
    names = list(QUERIES)
    window = set(names[:50])
    return [
        n
        for n in names
        if n in certified and n not in window and QUERIES[n][1] is not None
    ]


ROTATED = _rotated_out_certified()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_rotation_set_is_nonempty_and_sane():
    # r1-r4 certified 121 distinct queries; after the r5 rotation pulled 17
    # of them back in as window pads, the rotated-out regression net must
    # still cover the big earlier-round blocks
    assert len(ROTATED) >= 30
    assert "q10_returned_items" in ROTATED  # r2-certified, past the boundary
    assert "stream_events_tumbling_oracle" in ROTATED  # r3-certified stream


@pytest.mark.parametrize("name", ROTATED)
def test_rotated_out_query_still_matches_oracle(name, spark, duck):
    fn, sql = QUERIES[name]
    sdf = fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(sql)
    d_cols, d_rows = rel.columns, rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert canon(s_rows, s_cols) == canon(d_rows, d_cols)
    assert canon_pandas(sdf.toPandas()) == canon_pandas(duck.sql(sql).df())

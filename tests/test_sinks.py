"""Sink semantics: canonical CSV formats, append mode, JSON shapes, and the
keyed MERGE/upsert (ports of the reference's writer behavior — CsvWriter.cs
canonical formats, CsvTests.cs:111-197 round-trips, PostgreSqlWriter.cs
ON CONFLICT upsert semantics)."""

import datetime as dt
import glob
import json
import os

from pyspark.sql import functions as F

from pipeflow_spark.sinks import (
    canonicalize,
    collect_json_document,
    jdbc,
    read_upsert_table,
    upsert_parquet,
    upsert_statement,
    write,
)


def _csv_lines(path):
    lines = []
    for f in sorted(glob.glob(os.path.join(path, "part-*"))):
        with open(f) as fh:
            lines += [l.rstrip("\n") for l in fh if l.strip()]
    return lines


def test_csv_canonical_formats(spark, tmp_path):
    """DateTime -> 'yyyy-MM-dd HH:mm:ss', bool -> lowercase (CsvWriter.cs:135-147)."""
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 5, 7, 9, 11), True), (2, dt.datetime(2024, 12, 31, 23, 59, 59), False)],
        "id int, ts timestamp, flag boolean",
    )
    out = str(tmp_path / "csv_out")
    write.csv(df.coalesce(1), out)
    lines = _csv_lines(out)
    assert lines[0] == "id,ts,flag"
    assert sorted(lines[1:]) == [
        "1,2024-03-05 07:09:11,true",
        "2,2024-12-31 23:59:59,false",
    ]


def test_csv_quoting_roundtrip(spark, tmp_path):
    """Embedded delimiter/quote/newline survive a write->read cycle
    (CsvTests.cs:143-167)."""
    rows = [(1, 'has,comma'), (2, 'has "quotes"'), (3, "has\nnewline")]
    df = spark.createDataFrame(rows, "id int, note string")
    out = str(tmp_path / "csv_quote")
    write.csv(df.coalesce(1), out)
    back = (
        spark.read.options(header=True, multiLine=True, quote='"', escape='"')
        .schema("id int, note string")
        .csv(out)
    )
    assert sorted((r.id, r.note) for r in back.collect()) == sorted(rows)


def test_csv_append_mode(spark, tmp_path):
    df1 = spark.createDataFrame([(1, "a")], "id int, v string")
    df2 = spark.createDataFrame([(2, "b")], "id int, v string")
    out = str(tmp_path / "csv_append")
    write.csv(df1, out)
    write.csv(df2, out, mode="append")
    back = spark.read.options(header=True).schema("id int, v string").csv(out)
    assert back.count() == 2


def test_json_document_and_jsonl(spark, tmp_path):
    df = spark.createDataFrame([(2, "b"), (1, "a")], "id int, v string")
    jsonl = str(tmp_path / "jl")
    write.json(df, jsonl)
    assert spark.read.json(jsonl).count() == 2
    doc = str(tmp_path / "doc.json")
    collect_json_document(df, doc, order_by=["id"])
    with open(doc) as f:
        data = json.load(f)
    assert data == [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]


def test_upsert_do_update(spark, tmp_path):
    """ON CONFLICT DO UPDATE: incoming wins (PostgreSqlWriter.cs:228-244)."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "old1"), (2, "old2")], "k int, v string")
    upsert_parquet(spark, base, path, ["k"])
    inc = spark.createDataFrame([(2, "new2"), (3, "new3")], "k int, v string")
    upsert_parquet(spark, inc, path, ["k"])
    got = sorted((r.k, r.v) for r in read_upsert_table(spark, path).collect())
    assert got == [(1, "old1"), (2, "new2"), (3, "new3")]


def test_upsert_do_nothing(spark, tmp_path):
    """ON CONFLICT DO NOTHING: existing wins (PostgreSqlWriter.cs:222-226)."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "old1"), (2, "old2")], "k int, v string")
    upsert_parquet(spark, base, path, ["k"])
    inc = spark.createDataFrame([(2, "new2"), (3, "new3")], "k int, v string")
    upsert_parquet(spark, inc, path, ["k"], do_update=False)
    got = sorted((r.k, r.v) for r in read_upsert_table(spark, path).collect())
    assert got == [(1, "old1"), (2, "old2"), (3, "new3")]


def test_upsert_idempotent_replay(spark, tmp_path):
    """Replaying the same merge is a no-op — the batch-side analog of the
    exactly-once sink's replay guarantee."""
    path = str(tmp_path / "tbl")
    inc = spark.createDataFrame([(1, "v1"), (2, "v2")], "k int, v string")
    upsert_parquet(spark, inc, path, ["k"])
    upsert_parquet(spark, inc, path, ["k"])
    got = sorted((r.k, r.v) for r in read_upsert_table(spark, path).collect())
    assert got == [(1, "v1"), (2, "v2")]


def test_upsert_dedupes_incoming_keys(spark, tmp_path):
    """Duplicate keys in the incoming batch collapse to one row per key —
    a MERGE source must never hit a target row twice (PG error 21000); with
    order_by, last-wins under that ordering."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "old1", 0)], "k int, v string, seq int")
    upsert_parquet(spark, base, path, ["k"])
    inc = spark.createDataFrame(
        [(1, "mid", 5), (1, "late", 9), (2, "a", 1), (2, "b", 2)],
        "k int, v string, seq int",
    )
    upsert_parquet(spark, inc, path, ["k"], order_by=["seq"])
    got = sorted((r.k, r.v) for r in read_upsert_table(spark, path).collect())
    assert got == [(1, "late"), (2, "b")]
    # first-write path dedupes too
    path2 = str(tmp_path / "tbl2")
    upsert_parquet(spark, inc, path2, ["k"], order_by=["seq"])
    got2 = sorted((r.k, r.v) for r in read_upsert_table(spark, path2).collect())
    assert got2 == [(1, "late"), (2, "b")]


def test_upsert_snapshot_pointer_commit(spark, tmp_path):
    """The commit is a pointer flip: the table dir always holds a readable
    current snapshot, the pre-flip snapshot survives for in-flight readers,
    and older snapshots are expired."""
    path = str(tmp_path / "tbl")
    for i in range(4):
        inc = spark.createDataFrame([(1, f"v{i}")], "k int, v string")
        upsert_parquet(spark, inc, path, ["k"])
    entries = sorted(os.listdir(path))
    snaps = [d for d in entries if d.startswith("snapshot-")]
    assert "_CURRENT" in entries and len(snaps) == 2  # current + one retained
    # _CURRENT is a commit LOG (one name per line, last = current); every
    # retained entry's dir exists
    with open(os.path.join(path, "_CURRENT")) as f:
        log = [ln.strip() for ln in f if ln.strip()]
    assert log and log[-1] in snaps and set(log) <= set(snaps)
    assert [(r.k, r.v) for r in read_upsert_table(spark, path).collect()] == [(1, "v3")]


def test_upsert_matches_duckdb_merge_oracle(spark, tmp_path):
    """Differential: the same 3-batch upsert sequence through DuckDB's native
    INSERT ... ON CONFLICT yields the identical table (VERDICT round-1 ask:
    MERGE semantics vs a real SQL engine, not just self-consistency)."""
    import duckdb

    batches = [
        [(1, "a1"), (2, "b1")],
        [(2, "b2"), (3, "c1")],
        [(1, "a3"), (4, "d1")],
    ]
    path = str(tmp_path / "tbl")
    for rows in batches:
        upsert_parquet(spark, spark.createDataFrame(rows, "k int, v string"), path, ["k"])
    got = sorted((r.k, r.v) for r in read_upsert_table(spark, path).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT PRIMARY KEY, v VARCHAR)")
    for rows in batches:
        con.executemany("INSERT INTO t VALUES (?, ?) ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v", rows)
    assert got == sorted(con.execute("SELECT k, v FROM t").fetchall())


# -- JDBC sink surface -------------------------------------------------------


def test_upsert_statement_postgresql():
    s = upsert_statement("tgt", "stg", ["k1", "k2", "a", "b"], ["k1", "k2"])
    assert s == (
        "INSERT INTO tgt (k1, k2, a, b) SELECT k1, k2, a, b FROM stg "
        "ON CONFLICT (k1, k2) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b"
    )
    s2 = upsert_statement("tgt", "stg", ["k", "a"], ["k"], do_update=False)
    assert s2.endswith("ON CONFLICT (k) DO NOTHING")
    # key-only table: nothing to update → DO NOTHING
    s3 = upsert_statement("tgt", "stg", ["k"], ["k"])
    assert s3.endswith("DO NOTHING")


def test_upsert_statement_sqlserver():
    s = upsert_statement("tgt", "stg", ["k", "a"], ["k"], dialect="sqlserver")
    assert s == (
        "MERGE INTO tgt AS t USING stg AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET t.a = s.a "
        "WHEN NOT MATCHED THEN INSERT (k, a) VALUES (s.k, s.a);"
    )


def test_jdbc_upsert_plumbing(spark, monkeypatch):
    """No JDBC driver in the sandbox: verify the staging-write → merge →
    drop-staging protocol and option passthrough with a captured writer."""
    calls = []
    monkeypatch.setattr(jdbc, "write", staticmethod(
        lambda df, url, table, mode="append", **opts: calls.append(("write", url, table, mode, opts))))
    ran = []
    df = spark.createDataFrame([(1, "x", 2), (1, "y", 1)], "k int, v string, seq int")
    stmt = jdbc.upsert(df, "jdbc:postgresql://db/x", "tgt", ["k"], ran.append,
                       order_by=["seq"], batch_size=5000)
    assert calls[0][1:4] == ("jdbc:postgresql://db/x", "tgt__staging", "overwrite")
    assert calls[0][4]["batch_size"] == 5000
    assert ran == [stmt, "DROP TABLE tgt__staging"]
    assert stmt.startswith("INSERT INTO tgt (k, v, seq) SELECT k, v, seq FROM tgt__staging ON CONFLICT (k)")


def test_canonicalize_preserves_non_special_types(spark):
    df = spark.createDataFrame([(1, 2.5, "x")], "a int, b double, c string")
    assert canonicalize(df).collect() == df.collect()


def test_end_to_end_read_filter_sort_write_reread(spark, scores, tmp_path):
    """The reference's flagship e2e (CsvTests.cs:169-197): filter score>=85,
    sort desc, write CSV, re-read, verify order and values."""
    out = str(tmp_path / "e2e")
    result = scores.filter(F.col("score") >= 85).orderBy(F.col("score").desc())
    write.csv(result.coalesce(1), out)
    back = (
        spark.read.options(header=True)
        .schema("id int, name string, score int")
        .csv(out)
        .orderBy(F.col("score").desc())
        .collect()
    )
    assert [(r.name, r.score) for r in back] == [("Eve", 95), ("Bob", 92), ("Diana", 88), ("Alice", 85)]


def test_jdbc_partition_options():
    """Range-partitioned JDBC read plumbing (keyset-paging analog of
    QueryablePipelineBuilder.cs:284-312) — options validated at build time."""
    import pytest

    from pipeflow_spark import jdbc_partition_options

    opts = jdbc_partition_options("id", 0, 1_000_000, 16)
    assert opts == {
        "partitionColumn": "id",
        "lowerBound": "0",
        "upperBound": "1000000",
        "numPartitions": "16",
    }
    with pytest.raises(ValueError):
        jdbc_partition_options("id", 10, 10)
    with pytest.raises(ValueError):
        jdbc_partition_options("ts", "2024-02-01", "2024-01-01")
    with pytest.raises(ValueError):
        jdbc_partition_options("id", 0, 1, num_partitions=0)


# -- snapshot time travel + streaming upsert ---------------------------------

def test_upsert_time_travel(spark, tmp_path):
    from pipeflow_spark.sinks import read_upsert_table, snapshots, upsert_parquet

    t = str(tmp_path / "tt")
    for ver, val in enumerate(["a", "b", "c"], start=1):
        df = spark.createDataFrame([(1, val), (ver, f"row{ver}")], "id long, v string")
        upsert_parquet(spark, df, t, keys=["id"], keep_snapshots=3)
    snaps = snapshots(t)
    assert [s["version"] for s in snaps] == [1, 2, 3]
    assert [s["is_current"] for s in snaps] == [False, False, True]
    # VERSION AS OF: key 1 held 'a' at v1, 'b' at v2, 'c' now
    assert {r.id: r.v for r in read_upsert_table(spark, t, version=1).collect()} == {1: "a"}
    v2 = {r.id: r.v for r in read_upsert_table(spark, t, version=2).collect()}
    assert v2 == {1: "b", 2: "row2"}
    now = {r.id: r.v for r in read_upsert_table(spark, t).collect()}
    assert now == {1: "c", 2: "row2", 3: "row3"}
    # expiry honors keep_snapshots: a 4th commit drops v1
    upsert_parquet(spark, spark.createDataFrame([(9, "z")], "id long, v string"),
                   t, keys=["id"], keep_snapshots=3)
    assert [s["version"] for s in snapshots(t)] == [2, 3, 4]
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="not retained"):
        read_upsert_table(spark, t, version=1)


def test_expiry_ranks_by_commit_order_not_name(spark, tmp_path):
    """ADVICE r2 (medium): catalog.write() leaves an unversioned
    snapshot-<uuid12> dir that lexicographically sorts after versioned
    snapshot-NNNNNN-<hex> names.  Name-sorted expiry let that stale dir eat a
    keep slot and rmtree'd the immediately-previous versioned snapshot —
    breaking in-flight readers and VERSION AS OF right after the commit.
    Expiry must rank by commit order (version/mtime), keep the pre-flip
    current, and never count uncommitted dirs toward the quota."""
    from pipeflow_spark.catalog import TableCatalog
    from pipeflow_spark.sinks import read_upsert_table, snapshots, upsert_parquet

    cat = TableCatalog(spark, str(tmp_path), format="parquet")
    cat.write(spark.createDataFrame([(1, "seed")], "id long, v string"), "t")
    t = str(tmp_path / "t")
    # the catalog overwrite dir is unversioned (snapshot-<uuid>) and sorts last
    assert any(
        d.startswith("snapshot-") and not d.split("-")[1].isdigit() for d in os.listdir(t)
    )
    for ver, val in enumerate(["a", "b"], start=1):
        upsert_parquet(
            spark,
            spark.createDataFrame([(1, val)], "id long, v string"),
            t,
            keys=["id"],
            keep_snapshots=2,
        )
    vers = sorted(s["version"] for s in snapshots(t))
    # both versioned snapshots survive; the stale uuid dir is the one expired
    assert len(vers) == 2, vers
    assert {r.v for r in read_upsert_table(spark, t, version=vers[0]).collect()} == {"a"}
    assert {r.v for r in read_upsert_table(spark, t, version=vers[1]).collect()} == {"b"}
    prev_latest = vers[1]
    # an uncommitted (crashed) write dir must not displace a real snapshot
    os.makedirs(os.path.join(t, "snapshot-999999-deadbeef"))  # no _SUCCESS
    upsert_parquet(
        spark,
        spark.createDataFrame([(1, "c")], "id long, v string"),
        t,
        keys=["id"],
        keep_snapshots=2,
    )
    assert not os.path.isdir(os.path.join(t, "snapshot-999999-deadbeef"))  # orphan swept
    vers = [s["version"] for s in snapshots(t)]
    assert prev_latest in vers and max(vers) > prev_latest, vers  # previous snapshot retained


def test_streaming_upsert_merges_and_replays_idempotently(spark, tmp_path):
    """CDC stream → keyed MERGE table: batch-sequential upserts converge to
    last-wins by event time, and a full replay from a fresh checkpoint is a
    no-op (exactly-once via idempotent merge, no ledger)."""
    import datetime as dt

    from pipeflow_spark.sinks import read_upsert_table
    from pipeflow_spark.streaming import StreamingPipeline

    src = tmp_path / "cdc_src"
    src.mkdir()
    t0 = dt.datetime(2025, 1, 1)
    f1 = spark.createDataFrame(
        [(1, "one@v1", t0), (2, "two@v1", t0)], "id long, v string, ts timestamp"
    )
    f2 = spark.createDataFrame(
        [(2, "two@v2", t0 + dt.timedelta(hours=1)), (3, "three@v1", t0 + dt.timedelta(hours=1))],
        "id long, v string, ts timestamp",
    )
    f1.coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))
    f2.coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))

    table = str(tmp_path / "cdc_table")
    def run(ckpt):
        stream = (
            spark.readStream.schema(f1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = StreamingPipeline(stream).start_upsert(
            table, keys=["id"], checkpoint_dir=ckpt, order_by=["ts"], keep_snapshots=5
        )
        q.awaitTermination()

    run(str(tmp_path / "ckpt1"))
    expect = {1: "one@v1", 2: "two@v2", 3: "three@v1"}
    assert {r.id: r.v for r in read_upsert_table(spark, table).collect()} == expect
    # full replay from scratch: merge is idempotent, table unchanged
    run(str(tmp_path / "ckpt2"))
    assert {r.id: r.v for r in read_upsert_table(spark, table).collect()} == expect


def test_snapshot_versions_monotonic_past_expiry(spark, tmp_path):
    """Version ids must keep increasing after old snapshots expire — a
    count-based sequence would mint duplicate/regressing versions once
    retention trims the directory list."""
    from pipeflow_spark.sinks import snapshots, upsert_parquet

    t = str(tmp_path / "mono")
    for i in range(6):
        upsert_parquet(
            spark, spark.createDataFrame([(1, f"v{i}")], "id long, v string"),
            t, keys=["id"], keep_snapshots=2,
        )
    vers = [s["version"] for s in snapshots(t)]
    assert vers == [5, 6]  # six commits, last two retained, ids never reused


def test_compact_snapshot_preserves_data(spark, tmp_path):
    from pipeflow_spark.sinks import compact_snapshot, read_upsert_table, snapshots, upsert_parquet

    t = str(tmp_path / "cmp")
    df = spark.range(1000).selectExpr("id", "cast(id % 7 as string) AS grp")
    upsert_parquet(spark, df.repartition(16), t, keys=["id"])
    before = sorted(r.id for r in read_upsert_table(spark, t).collect())
    n_files = compact_snapshot(spark, t, target_files=2, sort_by=["grp"])
    assert n_files <= 2
    after = sorted(r.id for r in read_upsert_table(spark, t).collect())
    assert after == before  # bit-identical content, new layout
    # compaction is a real commit: version advanced, old snapshot retained
    assert [s["is_current"] for s in snapshots(t)] == [False, True]


def test_rollback_snapshot_ref_move(spark, tmp_path):
    import pytest as _pytest

    from pipeflow_spark.sinks import (
        read_upsert_table,
        rollback_snapshot,
        snapshots,
        upsert_parquet,
    )

    t = str(tmp_path / "rb")
    for i in range(3):
        upsert_parquet(
            spark,
            spark.createDataFrame([(1, f"v{i}")], "id long, v string"),
            t,
            keys=["id"],
            keep_snapshots=3,
        )
    assert read_upsert_table(spark, t).collect()[0].v == "v2"
    v0 = snapshots(t)[0]["version"]
    rollback_snapshot(t, v0)
    # current flips to the old snapshot; no new version minted, no data moved
    assert read_upsert_table(spark, t).collect()[0].v == "v0"
    assert [s["is_current"] for s in snapshots(t)] == [True, False, False]
    # the next upsert merges against the rolled-back state and history
    # stays monotonic (version ids never rewind or get reused)
    upsert_parquet(
        spark, spark.createDataFrame([(2, "w")], "id long, v string"), t,
        keys=["id"], keep_snapshots=4,
    )
    assert {(r.id, r.v) for r in read_upsert_table(spark, t).collect()} == {(1, "v0"), (2, "w")}
    assert snapshots(t)[-1]["version"] > v0 + 1 and snapshots(t)[-1]["is_current"]
    with _pytest.raises(ValueError, match="not retained"):
        rollback_snapshot(t, 999)


def test_compact_snapshot_zorder_clusters(spark, tmp_path):
    import pytest as _pytest

    from pipeflow_spark.operators.zorder import file_stats
    from pipeflow_spark.sinks import compact_snapshot, read_upsert_table, upsert_parquet

    t = str(tmp_path / "zcmp")
    df = spark.createDataFrame(
        [(x * 32 + y, x, float(y)) for x in range(32) for y in range(32)],
        "id long, x long, y double",
    )
    upsert_parquet(spark, df.repartition(16), t, keys=["id"])
    before = sorted(r.id for r in read_upsert_table(spark, t).collect())
    n_files = compact_snapshot(spark, t, target_files=4, zorder_by=["x", "y"])
    assert n_files <= 4
    assert sorted(r.id for r in read_upsert_table(spark, t).collect()) == before
    # Morton layout: per-file spans on BOTH dims well under the global 31
    from pipeflow_spark.sinks import _current_snapshot

    st = file_stats(spark, _current_snapshot(t), ["x", "y"]).collect()
    for c in ("x", "y"):
        mean = sum(r[f"max_{c}"] - r[f"min_{c}"] for r in st) / len(st)
        assert mean < 0.7 * 31
    with _pytest.raises(ValueError, match="not both"):
        compact_snapshot(spark, t, sort_by=["x"], zorder_by=["y"])


# -- change data feed (Delta CDF / Iceberg changelog analog) ------------------


def test_change_feed_records_inserts_and_updates(spark, tmp_path):
    """Every applied MERGE row lands in _changes/ tagged insert /
    update_postimage, partitioned by the commit version, and version-range
    reads see exactly the requested commits."""
    from pipeflow_spark.sinks import read_change_feed

    path = str(tmp_path / "tbl")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    upsert_parquet(spark, b1, path, ["k"], change_feed=True)
    b2 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    upsert_parquet(spark, b2, path, ["k"], change_feed=True)

    got = sorted(
        (r.k, r._change_type, r._commit_version)
        for r in read_change_feed(spark, path).collect()
    )
    assert got == [
        (1, "insert", 1),
        (2, "insert", 1),
        (2, "update_postimage", 2),
        (3, "insert", 2),
    ]
    inc = read_change_feed(spark, path, starting_version=2)
    assert sorted((r.k, r._change_type) for r in inc.collect()) == [
        (2, "update_postimage"),
        (3, "insert"),
    ]
    # postimage carries the new value, not the old one
    post = {r.k: r.v for r in inc.collect()}
    assert post[2] == "B"


def test_change_feed_do_nothing_emits_only_applied_rows(spark, tmp_path):
    """do_update=False: a matched key is NOT applied, so it must emit no
    change row — the feed records what the commit did, not what it saw."""
    from pipeflow_spark.sinks import read_change_feed

    path = str(tmp_path / "tbl")
    upsert_parquet(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        path,
        ["k"],
        change_feed=True,
    )
    upsert_parquet(
        spark,
        spark.createDataFrame([(2, "IGNORED"), (3, "c")], "k int, v string"),
        path,
        ["k"],
        do_update=False,
        change_feed=True,
    )
    v2 = read_change_feed(spark, path, starting_version=2).collect()
    assert [(r.k, r._change_type, r.v) for r in v2] == [(3, "insert", "c")]


def test_change_feed_version_range_is_partition_pruned(spark, tmp_path):
    """'Changes since version N' must prune whole commit directories at plan
    time, not scan-and-filter — that is what makes CDC reads O(new data) on
    a table with a deep feed."""
    from pipeflow_spark.sinks import read_change_feed

    path = str(tmp_path / "tbl")
    for i in range(1, 4):
        upsert_parquet(
            spark,
            spark.createDataFrame([(i, f"v{i}")], "k int, v string"),
            path,
            ["k"],
            change_feed=True,
        )
    df = read_change_feed(spark, path, starting_version=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_commit_version" in plan.split("PartitionFilters", 1)[1][:200]
    assert [r.k for r in df.collect()] == [3]


def test_change_feed_crash_recovery(spark, tmp_path):
    """Crash between pointer flip and feed publish: the staged dir is
    renamed into place by the next writer (no feed gap).  A staged dir for a
    never-committed version is dropped (no phantom version)."""
    import shutil as _sh

    from pipeflow_spark.sinks import _CHANGES, read_change_feed

    path = str(tmp_path / "tbl")
    for i in range(1, 3):
        upsert_parquet(
            spark,
            spark.createDataFrame([(i, f"v{i}")], "k int, v string"),
            path,
            ["k"],
            change_feed=True,
        )
    cdir = os.path.join(path, _CHANGES)
    # simulate the crash: v2's publish rename never happened
    os.rename(os.path.join(cdir, "_commit_version=2"), os.path.join(cdir, ".staging-2-dead"))
    # and a phantom staging for a version that never committed
    os.makedirs(os.path.join(cdir, ".staging-99-dead"))
    upsert_parquet(
        spark,
        spark.createDataFrame([(3, "v3")], "k int, v string"),
        path,
        ["k"],
        change_feed=True,
    )
    names = sorted(d for d in os.listdir(cdir) if not d.startswith("."))
    assert names == ["_commit_version=1", "_commit_version=2", "_commit_version=3"]
    assert not any(d.startswith(".staging") for d in os.listdir(cdir))
    vers = sorted(
        r._commit_version for r in read_change_feed(spark, path).select("_commit_version").collect()
    )
    assert vers == [1, 2, 3]
    _sh.rmtree(path, ignore_errors=True)


def test_stream_change_feed_tails_commits_incrementally(spark, tmp_path):
    """A checkpointed stream over the feed consumes each commit exactly once:
    the first run drains versions 1-2, a later run with the same checkpoint
    picks up only version 3 — incremental CDC, no reprocessing."""
    from pipeflow_spark.sinks import stream_change_feed

    path = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def commit(rows):
        upsert_parquet(
            spark,
            spark.createDataFrame(rows, "k int, v string"),
            path,
            ["k"],
            change_feed=True,
        )

    def drain():
        q = (
            stream_change_feed(spark, path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.k, r._change_type, r._commit_version) for r in spark.read.parquet(out).collect()
        )

    commit([(1, "a"), (2, "b")])
    commit([(2, "B")])
    first = drain()
    assert first == [(1, "insert", 1), (2, "insert", 1), (2, "update_postimage", 2)]
    commit([(3, "c")])
    second = drain()
    assert second == first + [(3, "insert", 3)] or second == sorted(
        first + [(3, "insert", 3)]
    )


def test_expire_change_feed_keeps_newest(spark, tmp_path):
    from pipeflow_spark.sinks import expire_change_feed, read_change_feed

    path = str(tmp_path / "tbl")
    for i in range(1, 5):
        upsert_parquet(
            spark,
            spark.createDataFrame([(i, "x")], "k int, v string"),
            path,
            ["k"],
            change_feed=True,
        )
    assert expire_change_feed(path, keep_versions=2) == [1, 2]
    vers = sorted(
        r._commit_version for r in read_change_feed(spark, path).select("_commit_version").collect()
    )
    assert vers == [3, 4]


def test_upsert_schema_evolution(spark, tmp_path):
    """merge_schema=True: incoming may add columns (retained rows NULL) or
    omit columns (incoming rows NULL); the committed snapshot carries the
    union schema.  Default remains strict — a differing schema raises."""
    import pytest as _pytest

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    upsert_parquet(spark, base, path, ["k"])
    inc = spark.createDataFrame([(2, "b2", 0.5), (3, "c", 0.9)], "k int, v string, score double")
    with _pytest.raises(ValueError, match="merge_schema"):
        upsert_parquet(spark, inc, path, ["k"])
    upsert_parquet(spark, inc, path, ["k"], merge_schema=True)
    got = {r.k: (r.v, r.score) for r in read_upsert_table(spark, path).collect()}
    assert got == {1: ("a", None), 2: ("b2", 0.5), 3: ("c", 0.9)}
    # incoming OMITS v: existing column survives, new row gets NULL there
    inc2 = spark.createDataFrame([(4, 0.1)], "k int, score double")
    upsert_parquet(spark, inc2, path, ["k"], merge_schema=True)
    got = {r.k: (r.v, r.score) for r in read_upsert_table(spark, path).collect()}
    assert got[4] == (None, 0.1) and got[1] == ("a", None)


def test_upsert_schema_evolution_change_feed_union(spark, tmp_path):
    """The change feed spans commits with different schemas: read back as
    the NULL-padded union (mergeSchema), with per-commit rows intact."""
    from pipeflow_spark.sinks import read_change_feed

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a")], "k int, v string")
    upsert_parquet(spark, base, path, ["k"], change_feed=True)
    inc = spark.createDataFrame([(1, "a2", 7)], "k int, v string, extra int")
    upsert_parquet(spark, inc, path, ["k"], change_feed=True, merge_schema=True)
    feed = read_change_feed(spark, path)
    assert {"k", "v", "extra", "_change_type", "_commit_version"} <= set(feed.columns)
    rows = {(r._commit_version, r.k): (r.v, r.extra, r._change_type) for r in feed.collect()}
    assert rows[(1, 1)] == ("a", None, "insert")
    assert rows[(2, 1)] == ("a2", 7, "update_postimage")


def test_commit_log_phantom_success_dir_never_published(spark, tmp_path):
    """Commit-log protocol: a crash BETWEEN the snapshot write and the
    pointer flip leaves a dir whose _SUCCESS looks complete but that was
    never published.  Committed = commit-log membership, not _SUCCESS — the
    phantom must not be listed, must not be a time-travel target, must not
    occupy a keep slot, and is swept as an orphan at the next expiry."""
    import pytest

    from pipeflow_spark.sinks import read_upsert_table, snapshots, upsert_parquet

    t = str(tmp_path / "tbl")
    for val in ["a", "b"]:
        upsert_parquet(spark, spark.createDataFrame([(1, val)], "id long, v string"),
                       t, keys=["id"], keep_snapshots=3)
    phantom = os.path.join(t, "snapshot-000099-feedface")
    spark.createDataFrame([(1, "PHANTOM")], "id long, v string").write.parquet(phantom)
    assert os.path.exists(os.path.join(phantom, "_SUCCESS"))  # looks committed…
    assert [s["version"] for s in snapshots(t)] == [1, 2]     # …but is not
    with pytest.raises(FileNotFoundError, match="not retained"):
        read_upsert_table(spark, t, version=99)
    upsert_parquet(spark, spark.createDataFrame([(1, "c")], "id long, v string"),
                   t, keys=["id"], keep_snapshots=3)
    assert not os.path.isdir(phantom)                         # orphan swept
    # version numbering is conservative past crashed dirs: the next commit
    # mints 100 (> the phantom's 99), so a version id can never collide with
    # an orphan a concurrent crash left behind — uniqueness over density
    assert [s["version"] for s in snapshots(t)] == [1, 2, 100]
    assert {r.v for r in read_upsert_table(spark, t).collect()} == {"c"}


def test_rollback_reappend_ranks_target_newest_for_expiry(spark, tmp_path):
    """rollback re-APPENDS the target to the commit log, so expiry ranks the
    rolled-back-to snapshot at its latest occurrence: commits after the
    rollback must never expire the snapshot the table is actually built on,
    even though it is the oldest by version number.  The trimmed log stays
    consistent: every entry's dir exists and the last line is current."""
    from pipeflow_spark.sinks import (read_upsert_table, rollback_snapshot,
                                      snapshots, upsert_parquet)

    t = str(tmp_path / "tbl")
    for val in ["a", "b", "c"]:
        upsert_parquet(spark, spark.createDataFrame([(1, val)], "id long, v string"),
                       t, keys=["id"], keep_snapshots=3)
    rollback_snapshot(t, 1)
    assert {r.v for r in read_upsert_table(spark, t).collect()} == {"a"}
    # keep_snapshots=2 after the rollback: window = {v1 (re-appended), v4};
    # v2/v3 expire, the active v1 base survives
    upsert_parquet(spark, spark.createDataFrame([(2, "d")], "id long, v string"),
                   t, keys=["id"], keep_snapshots=2)
    vers = [s["version"] for s in snapshots(t)]
    assert 1 in vers and max(vers) == 4 and 2 not in vers and 3 not in vers, vers
    got = {r.id: r.v for r in read_upsert_table(spark, t).collect()}
    assert got == {1: "a", 2: "d"}  # built on the rolled-back-to base
    with open(os.path.join(t, "_CURRENT")) as f:
        log = [ln.strip() for ln in f if ln.strip()]
    assert log[-1].startswith("snapshot-000004-")
    assert all(os.path.isdir(os.path.join(t, n)) for n in log)


def test_commit_log_model_random_op_sequence(spark, tmp_path):
    """Model-based protocol check: a seeded random interleaving of upsert /
    rollback / compact / crash-orphan operations against the pointer table
    preserves every invariant the readers rely on —

    * the current read always equals the model's last-writer-wins state;
    * snapshots() lists strictly-ascending unique versions with exactly one
      is_current, whose content is the current state;
    * every retained version time-travels to exactly the state the model
      had when that version committed;
    * crash debris (un-published _SUCCESS dirs, stray .tmp pointers) never
      changes any read and is swept by the next expiry."""
    import random

    from pipeflow_spark.sinks import (compact_snapshot, read_upsert_table,
                                      rollback_snapshot, snapshots,
                                      upsert_parquet)

    rng = random.Random(42)
    t = str(tmp_path / "tbl")

    def df_of(pairs):
        return spark.createDataFrame(list(pairs), "k int, v string")

    def read_state(version=None):
        return {r.k: r.v for r in read_upsert_table(spark, t, version=version).collect()}

    current: dict = {}
    hist: dict = {}  # committed version -> full state at that commit
    # seed commit
    upsert_parquet(spark, df_of([(1, "seed")]), t, keys=["k"], keep_snapshots=3)
    current = {1: "seed"}
    hist[max(s["version"] for s in snapshots(t))] = dict(current)

    for step in range(12):
        op = rng.choice(["upsert", "upsert", "upsert", "rollback", "compact", "crash"])
        if op == "upsert":
            delta = {rng.randint(1, 4): f"s{step}.{i}" for i in range(rng.randint(1, 2))}
            upsert_parquet(spark, df_of(delta.items()), t, keys=["k"],
                           keep_snapshots=rng.randint(2, 3))
            current.update(delta)
            hist[max(s["version"] for s in snapshots(t))] = dict(current)
        elif op == "rollback":
            vers = [s["version"] for s in snapshots(t)]
            target = rng.choice(vers)
            rollback_snapshot(t, target)
            current = dict(hist[target])
        elif op == "compact":
            compact_snapshot(spark, t, target_files=1, keep_snapshots=3)
            hist[max(s["version"] for s in snapshots(t))] = dict(current)
        else:  # crash debris: a full-looking dir that was never published
            phantom = os.path.join(t, f"snapshot-9{step:05d}-deadbeef")
            df_of([(99, "PHANTOM")]).write.parquet(phantom)
            open(os.path.join(t, f"._CURRENT.{step}.tmp"), "w").write("junk")

        listed = snapshots(t)
        vers = [s["version"] for s in listed]
        assert vers == sorted(set(vers)), f"step {step}: versions not ascending-unique: {vers}"
        assert sum(s["is_current"] for s in listed) == 1, f"step {step}: != 1 current"
        cur_ver = next(s["version"] for s in listed if s["is_current"])
        assert read_state() == current, f"step {step} ({op}): current read diverged"
        assert hist[cur_ver] == current, f"step {step} ({op}): is_current points elsewhere"
        for v in vers:
            assert read_state(version=v) == hist[v], f"step {step}: time travel to {v} wrong"
        assert not any(r.k == 99 for r in read_upsert_table(spark, t).collect())


def test_upsert_group_replace_replaces_whole_key_group(spark, tmp_path):
    """group_replace: a key's entire row GROUP is deleted and re-inserted —
    stale members vanish (plain keyed upsert can only overwrite 1:1) — and
    untouched keys carry over; duplicate incoming rows collapse."""
    from pipeflow_spark.sinks import read_upsert_table, upsert_parquet

    table = str(tmp_path / "t")
    schema = "k int, member int, v string"
    upsert_parquet(
        spark,
        spark.createDataFrame([(1, 1, "a"), (1, 2, "b"), (2, 1, "x")], schema),
        table, ["k"], group_replace=True,
    )
    # replace key 1 with a SMALLER group; key 2 untouched; dup row collapses
    upsert_parquet(
        spark,
        spark.createDataFrame([(1, 9, "z"), (1, 9, "z")], schema),
        table, ["k"], group_replace=True,
    )
    got = sorted((r.k, r.member, r.v) for r in read_upsert_table(spark, table).collect())
    assert got == [(1, 9, "z"), (2, 1, "x")]


def test_upsert_group_replace_guards(spark, tmp_path):
    import pytest as _pytest

    from pipeflow_spark.sinks import upsert_parquet

    df = spark.createDataFrame([(1, 1)], "k int, v int")
    with _pytest.raises(ValueError, match="do_update"):
        upsert_parquet(spark, df, str(tmp_path / "a"), ["k"],
                       do_update=False, group_replace=True)
    with _pytest.raises(ValueError, match="change_feed"):
        upsert_parquet(spark, df, str(tmp_path / "b"), ["k"],
                       change_feed=True, group_replace=True)

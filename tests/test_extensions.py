"""Ports of PipeFlow.Tests/ExtensionTests.cs over the F2 employees fixture,
plus the validator DSL (DataValidator.cs rules)."""

import pytest
from pyspark.sql import functions as F

from pipeflow_spark import Pipeline, ValidationError, ValidationStrategy, Validator


def test_remove_duplicates_keeps_first(employees):
    # ExtensionTests.cs:47-60 — first occurrence by encounter order wins
    out = (
        Pipeline(employees)
        .remove_duplicates("id", order_cols=["row_order"])
        .order_by("id")
        .to_list()
    )
    assert len(out) == 3
    assert out[0].name == "Alice"  # not "Alice Duplicate"


def test_fill_missing(spark):
    # ExtensionTests.cs:62-84
    df = spark.createDataFrame([(1, None), (2, "x")], "id int, v string")
    out = Pipeline(df).fill_missing("v", "default").order_by("id").to_list()
    assert [r.v for r in out] == ["default", "x"]


def test_add_remove_rename_column(employees):
    # ExtensionTests.cs:86-128
    p = (
        Pipeline(employees)
        .add_column("bonus", F.col("salary") * 0.1)
        .remove_column("row_order")
        .rename_column("department", "dept")
    )
    cols = p.df.columns
    assert "bonus" in cols and "row_order" not in cols and "dept" in cols
    alice = p.filter("id = 1 and name = 'Alice'").first()
    assert alice.bonus == pytest.approx(7500.0)


def test_group_agg(employees):
    # ExtensionTests.cs:130-152 — Engineering: count=2, avg=78500, max=82000
    out = (
        Pipeline(employees)
        .group_agg(
            "department",
            F.count("*").alias("n"),
            F.avg("salary").alias("avg_salary"),
            F.max("salary").alias("max_salary"),
        )
        .order_by("department")
        .to_list()
    )
    eng = [r for r in out if r.department == "Engineering"][0]
    assert (eng.n, eng.avg_salary, eng.max_salary) == (2, 78500.0, 82000)


def test_group_apply_arbitrary_aggregator(employees):
    # the reference's arbitrary-lambda aggregator (PipeFlow.cs:483) → applyInPandas
    def spread(pdf):
        import pandas as pd

        return pd.DataFrame(
            {"department": [pdf.department.iloc[0]], "spread": [int(pdf.salary.max() - pdf.salary.min())]}
        )

    out = (
        Pipeline(employees)
        .group_apply("department", spread, "department string, spread long")
        .order_by("department")
        .to_list()
    )
    assert [r for r in out if r.department == "Engineering"][0].spread == 7000


def test_full_chain(employees):
    # ExtensionTests.cs:154-174 — dedupe → derive → filter → rename → sort
    out = (
        Pipeline(employees)
        .remove_duplicates("id", order_cols=["row_order"])
        .add_column("bonus", F.col("salary") * 0.1)
        .filter(F.col("salary") > 70000)
        .rename_column("name", "employee_name")
        .order_by_descending("salary")
        .to_list()
    )
    assert [r.employee_name for r in out] == ["Bob", "Alice"]


# -- validation DSL ----------------------------------------------------------

def _people_df(spark):
    return spark.createDataFrame(
        [
            (1, "alice@example.com", 30, "Alice"),
            (2, "not-an-email", 25, "Bob"),
            (3, None, 150, "x"),
            (4, "d@e.io", 40, None),
        ],
        "id int, email string, age int, name string",
    )


def test_validate_skip(spark):
    v = Validator()
    v.column("email").required().email()
    v.column("age").range(0, 120)
    v.column("name").required().min_length(2)
    out = Pipeline(_people_df(spark)).validate(v, ValidationStrategy.SKIP).to_list()
    assert [r.id for r in out] == [1]


def test_validate_null_passes_non_required(spark):
    v = Validator()
    v.column("email").email()  # null email passes when not required
    ids = {r.id for r in Pipeline(_people_df(spark)).validate(v).to_list()}
    assert ids == {1, 3, 4}


def test_validate_throw(spark):
    v = Validator()
    v.column("age").range(0, 120)
    # the guard is in-pass: the error surfaces at the terminal action
    with pytest.raises(ValidationError):
        Pipeline(_people_df(spark)).validate(v, ValidationStrategy.THROW).to_list()
    # all other terminals translate too
    with pytest.raises(ValidationError):
        Pipeline(_people_df(spark)).validate(v, ValidationStrategy.THROW).count()
    res = Pipeline(_people_df(spark)).validate(v, ValidationStrategy.THROW).execute()
    assert not res.success and "invalid row" in res.error


def test_validate_throw_single_pass(spark):
    """THROW must not run an eager extra scan: building the pipeline launches
    ZERO jobs (r2 ran filter(~valid).limit(1).count() up front — a second
    full read at 100 TB), and a valid dataset passes through unchanged in
    the one real action."""
    sc = spark.sparkContext
    v = Validator()
    v.column("age").range(0, 200)  # everyone valid
    sc.setJobGroup("throw_build", "build only")
    p = Pipeline(_people_df(spark)).validate(v, ValidationStrategy.THROW)
    build_jobs = spark.sparkContext.statusTracker().getJobIdsForGroup("throw_build")
    assert list(build_jobs) == [], "validate(THROW) launched an eager job"
    sc.setJobGroup("throw_action", "the single pass")
    assert p.count() == _people_df(spark).count()


def test_validate_with_results(spark):
    v = Validator()
    v.column("email").required().email()
    rows = {r.id: r.errors for r in Pipeline(_people_df(spark)).validate_with_results(v).to_list()}
    assert rows[1] == []
    assert any("valid email" in e for e in rows[2])
    assert any("required" in e for e in rows[3])


def test_validate_isin_type(spark):
    df = spark.createDataFrame([("O", "42"), ("X", "nope")], "status string, n string")
    v = Validator()
    v.column("status").isin("O", "F", "P")
    v.column("n").of_type("int")
    out = Pipeline(df).validate(v).to_list()
    assert len(out) == 1 and out[0].status == "O"


def test_unpivot_roundtrip(spark):
    """unpivot is pivot's inverse: wide (q1, q2 columns) → long → the original
    long rows; nulls in unmentioned cells are preserved as null values."""
    wide = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 3.0, None)], "k string, q1 double, q2 double"
    )
    out = (
        Pipeline(wide)
        .unpivot(ids=["k"], values=["q1", "q2"], var_name="quarter", value_name="v")
        .order_by("k", "quarter")
        .to_list()
    )
    assert [(r.k, r.quarter, r.v) for r in out] == [
        ("a", "q1", 1.0), ("a", "q2", 2.0), ("b", "q1", 3.0), ("b", "q2", None),
    ]


def test_transform_arrow_roundtrip(spark):
    """mapInArrow path: compute over raw RecordBatches (no pandas hop) and
    match the Column-algebra result."""
    import pyarrow as pa

    from pipeflow_spark import Pipeline
    from pyspark.sql import functions as F

    df = spark.range(100).selectExpr("id", "cast(id * 2 as double) AS v")

    def double_v(batch: pa.RecordBatch) -> pa.RecordBatch:
        v = pa.compute.multiply(batch.column("v"), pa.scalar(3.0))
        return pa.RecordBatch.from_arrays([batch.column("id"), v], ["id", "v3"])

    got = (
        Pipeline(df).transform_arrow(double_v, "id long, v3 double").df.orderBy("id").collect()
    )
    expect = df.select("id", (F.col("v") * 3.0).alias("v3")).orderBy("id").collect()
    assert got == expect


# --- Python UDTFs (functions.py) — the typed SelectMany ---------------------


def test_udtf_explode_json_map(spark):
    from pipeflow_spark.functions import register_udtfs

    register_udtfs(spark)
    rows = [
        (1, '{"k": 87, "s": "x", "arr": [1, 2], "obj": {"a": 1}}'),
        (2, None),
        (3, "not json"),
        (4, "[1, 2]"),  # non-object roots yield nothing
    ]
    spark.createDataFrame(rows, "id int, props string").createOrReplaceTempView("udtf_t")
    got = [
        (r.id, r.pos, r.key, r.value)
        for r in spark.sql(
            "SELECT t.id, j.* FROM udtf_t t, LATERAL explode_json_map(t.props) j "
            "ORDER BY id, pos"
        ).collect()
    ]
    # document order preserved; non-strings render as JSON text (rest.py coercion)
    assert got == [
        (1, 0, "k", "87"),
        (1, 1, "s", "x"),
        (1, 2, "arr", "[1, 2]"),
        (1, 3, "obj", '{"a": 1}'),
    ]


def test_udtf_parse_transcript_turns(spark):
    from pipeflow_spark.functions import register_udtfs

    register_udtfs(spark)
    raw = "garbage preamble\nUser: hi\nAssistant: hello\n  multi-line\ntool: run()\n"
    spark.createDataFrame([(raw,)], "raw string").createOrReplaceTempView("udtf_r")
    got = [
        (r.turn_idx, r.role, r.text)
        for r in spark.sql(
            "SELECT j.* FROM udtf_r r, LATERAL parse_transcript_turns(r.raw) j ORDER BY turn_idx"
        ).collect()
    ]
    assert got == [
        (0, "user", "hi"),
        (1, "assistant", "hello\n  multi-line"),
        (2, "tool", "run()"),
    ]


def test_validate_throw_checks_rows_past_prefix_terminals(spark):
    """Reference parity (PipeFlow.cs:522-539 validates EVERY row eagerly):
    the in-pass guard only sees rows the terminal's scan evaluates, so
    first()/first_or_default() (a take(1) scan) and take()-truncated plans
    must still fail when only a LATER row is invalid — a valid first row
    must not mask it.  Full-scan terminals stay single-pass (covered by
    test_validate_throw_single_pass)."""
    df = spark.createDataFrame(
        [(1, 50), (2, 999)], "id int, age int"  # row 1 valid, row 2 invalid
    ).orderBy("id")
    v = Validator()
    v.column("age").range(0, 120)
    with pytest.raises(ValidationError):
        Pipeline(df).validate(v, ValidationStrategy.THROW).first()
    with pytest.raises(ValidationError):
        Pipeline(df).validate(v, ValidationStrategy.THROW).first_or_default()
    with pytest.raises(ValidationError):
        Pipeline(df).validate(v, ValidationStrategy.THROW).take(1).to_list()
    # all-valid data sails through the same terminals
    ok = spark.createDataFrame([(1, 50), (2, 60)], "id int, age int")
    assert Pipeline(ok).validate(v, ValidationStrategy.THROW).first().id in (1, 2)
    assert len(Pipeline(ok).validate(v, ValidationStrategy.THROW).take(1).to_list()) == 1


def test_fluent_span_scd2_shard_bridges(spark):
    """The round-3 continuation fluent bridges delegate to their operators."""
    from datetime import datetime as DT

    from pipeflow_spark import Pipeline

    docs = spark.createDataFrame(
        [(1, "a b c d p q r"), (2, "a b c d s t u")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in
           Pipeline(docs).remove_dup_spans(min_len=3).to_list()}
    assert out[1]["clean_text"] == "p q r" and out[2]["n_removed"] == 4

    dim = spark.createDataFrame(
        [(1, "gold", DT(2024, 1, 1), None)],
        "user_id int, tier string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [(10, 1, DT(2024, 2, 1)), (11, 2, DT(2024, 2, 1))],
        "fact_id int, user_id int, ts timestamp",
    )
    got = {r["fact_id"]: r["tier"] for r in
           Pipeline(facts).scd2_enrich(dim, "user_id", "ts").to_list()}
    assert got == {10: "gold", 11: None}

    sh = {r["v"]: r["shard"] for r in
          Pipeline(spark.createDataFrame([(1.0,), (5.0,), (9.0,)], "v double"))
          .range_shards("v", [5.0]).to_list()}
    assert sh == {1.0: 1, 5.0: 1, 9.0: 2}

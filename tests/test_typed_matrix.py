"""Typed-matrix table (sources/typed.py): engine verdicts vs the row
kernel, per-class violation routing, and adapted outputs.

The driver gate (queries typed_matrix_*) cross-checks the same table
against DuckDB; this test pins the kernel parity side and the class
bookkeeping so regressions localize without running the gate.
"""

import pytest
from pyspark.sql import functions as F

from valideer_spark.engine import ValidationEngine
from valideer_spark.sources.typed import typed_rows, typed_schema

N = 1010  # 10 full residue cycles of 101


@pytest.fixture(scope="module")
def report(spark):
    eng = ValidationEngine(typed_schema(), id_col="rec_id")
    return eng.check(typed_rows(spark, N), adapt=True)


def test_verdict_counts(report):
    rows = report.annotated.select("_valid").collect()
    n_invalid = sum(1 for r in rows if not r["_valid"])
    # residues 1..15 mod 101 → exactly 15 invalid rows per 101-cycle
    assert n_invalid == 15 * (N // 101)


def test_constraint_classes(report):
    got = {
        (r["constraint"], r["path"]): r["count"]
        for r in report.annotated.filter(~F.col("_valid"))
        .select(F.try_element_at("_violations", F.lit(1)).alias("v"))
        .groupBy(F.col("v.constraint").alias("constraint"), F.col("v.path").alias("path"))
        .count()
        .collect()
    }
    per_class = N // 101
    expected = {
        ("string.min_length", "name"), ("string.max_length", "name"),
        ("range.min", "age"), ("range.max", "age"),
        ("enum", "status"), ("pattern", "email"),
        ("object.required", ""), ("range.min", "tags['neg']"),
        ("range.min", "pair[1]"), ("pattern", "codes[0]"),
        ("sequence.min_length", "codes"), ("adapt_to:int", "raw_num"),
        ("range.min", "raw_num"), ("any_of", "maybe_num"),
        ("range.max", "level"),
    }
    assert set(got) == expected
    assert all(v == per_class for v in got.values())


def test_kernel_parity_sample(report, spark):
    """Row kernel re-validates a slice of the typed table; verdicts must
    match the lowered plan exactly (same semantics, two execution paths)."""
    from valideer_spark.core import ValidationError

    schema = typed_schema()
    sample = report.annotated.filter(F.col("rec_id") < "rec-00000303").collect()
    assert len(sample) == 303
    for row in sample:
        doc = {}
        for name in ("rec_id", "name", "age", "status", "email", "flag",
                     "born", "when_t", "ratio", "nick", "raw_num",
                     "maybe_num", "level"):
            v = row[name]
            if v is not None:
                doc[name] = v
        doc["tags"] = dict(row["tags"])
        doc["pair"] = [row["pair"]["label"], row["pair"]["weight"]]
        doc["codes"] = list(row["codes"])
        try:
            schema.validate(doc, adapt=False)
            kernel_valid = True
        except ValidationError:
            kernel_valid = False
        assert kernel_valid == row["_valid"], row["rec_id"]


def test_adapted_defaults(report):
    adapted = {
        r["rec_id"]: r
        for r in report.annotated.filter(F.col("_valid"))
        .select("rec_id", F.col("_adapted.nick").alias("nick"),
                F.col("_adapted.raw_num").alias("raw_num"))
        .collect()
    }
    # i % 7 == 0 rows had NULL nick → default fills
    assert adapted["rec-00000000"]["nick"] == "anon"
    assert adapted["rec-00000016"]["nick"] == "nick16"
    # AdaptTo(int) coerced the digit string
    assert adapted["rec-00000016"]["raw_num"] == 16


def test_verdict_rollup_single_agg(spark):
    """rollup(_part_id) yields per-partition rows + one grand-total row
    whose counts equal the sum, in one grouping-sets aggregation."""
    from valideer_spark.engine import ValidationEngine
    from valideer_spark.flagship import doc_schema
    from valideer_spark.sources import synth_docs

    rep = ValidationEngine(doc_schema(), buckets=8).check(synth_docs(spark, 500))
    rows = rep.verdict_rollup().collect()
    total = [r for r in rows if r["is_total"] == 1]
    parts = [r for r in rows if r["is_total"] == 0]
    assert len(total) == 1 and len(parts) == 8
    assert total[0]["n_docs"] == sum(r["n_docs"] for r in parts) == 500
    assert total[0]["n_valid"] == sum(r["n_valid"] for r in parts)
    plan = rep.verdict_rollup()._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan  # grouping sets, single aggregation tree


def test_expect_frame_schema(spark):
    """Submit-time frame assertion: missing required columns raise
    SchemaError before any scan; optional/extra columns pass."""
    import pytest

    from valideer_spark.core import SchemaError
    from valideer_spark.plans import expect_frame_schema

    df = spark.range(1).selectExpr("'x' AS doc_id", "CAST(NULL AS STRING) AS extra")
    expect_frame_schema(df, {"+doc_id": "string", "?opt": "integer"})
    with pytest.raises(SchemaError, match="missing required columns.*spans"):
        expect_frame_schema(df, {"+doc_id": "string", "+spans": ["string"]})
    # non-object schema: nothing to assert structurally
    expect_frame_schema(df, "string")


def test_typed_plan_has_no_python_nodes(spark):
    """The full 16-validator typed predicate stays JVM-side: every family
    in the matrix lowers natively (the kernel fallback would appear as an
    ArrowEvalPython node)."""
    eng = ValidationEngine(typed_schema(), id_col="rec_id")
    df = typed_rows(spark, 100)
    plan = (
        eng.check(df).annotated.select("_valid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_query_registry_consistency():
    """Every oracle refers to a registered query; every query is callable;
    rows-only queries (no oracle) are the documented hash-seeded set."""
    from valideer_spark.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    assert all(callable(f) for f in QUERIES.values())
    # round 3: every registered query carries a DuckDB oracle — the five
    # formerly rows-only entries were converted to seeded-containment /
    # bound-style oracles (VERDICT r2 item 3)
    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only == set()


def test_partition_metrics_sum_to_global(spark):
    from valideer_spark.engine import ValidationEngine
    from valideer_spark.flagship import doc_schema
    from valideer_spark.sources import synth_docs

    rep = ValidationEngine(doc_schema(), buckets=8).check(synth_docs(spark, 1000))
    global_counts = {r["constraint"]: r["count"] for r in rep.metrics().collect()}
    per_part = rep.partition_metrics().collect()
    summed = {}
    for r in per_part:
        summed[r["constraint"]] = summed.get(r["constraint"], 0) + r["n"]
    assert summed == global_counts

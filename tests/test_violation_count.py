"""`_n_violations` (the native violation counter, plans/lowering.py
``Lowered.count``) must equal ``size(_violations)`` on EVERY row — the
verdict aggregations read the counter so the repr-heavy violation structs
never evaluate on that path, which is only sound if the two always agree.

Exercised over the three synthetic corpora that together cover every
lowering: the flagship docs (Object/sequence-of-struct/Enum/Range/Pattern/
conditions, null spans, empty sequences), the typed validator matrix
(Mapping, heterogeneous tuples, AnyOf/AllOf/ChainOf, AdaptTo, Nullable,
String bounds), and the open-extras map side channel.
"""

from pyspark.sql import functions as F

from valideer_spark.engine import ValidationEngine


def _assert_counts_match(report):
    df = report.annotated
    mismatched = df.filter(
        F.size("_violations") != F.col("_n_violations")
    ).count()
    assert mismatched == 0
    # and the counter is 0 exactly on valid rows
    assert df.filter(F.col("_valid") & (F.col("_n_violations") != 0)).count() == 0
    assert df.filter(~F.col("_valid") & (F.col("_n_violations") == 0)).count() == 0


def test_count_matches_size_flagship(spark):
    from valideer_spark.flagship import doc_schema
    from valideer_spark.sources import synth_docs

    report = ValidationEngine(doc_schema()).check(synth_docs(spark, 5000))
    _assert_counts_match(report)


def test_count_matches_size_typed_matrix(spark):
    from valideer_spark.sources.typed import typed_rows, typed_schema

    report = ValidationEngine(typed_schema(), id_col="rec_id").check(
        typed_rows(spark, 3000)
    )
    _assert_counts_match(report)


def test_count_matches_size_open_extras(spark):
    from valideer_spark import core as V

    df = spark.range(500).select(
        F.format_string("x-%06d", F.col("id")).alias("id"),
        F.when(
            F.col("id") % 13 == 0,
            F.create_map(F.lit("bad"), F.lit(-2).cast("long")),
        )
        .when(
            F.col("id") % 3 == 0,
            F.create_map(
                F.lit("a"), (F.col("id") % 7).cast("long"),
                F.lit("b"), F.lit(1).cast("long"),
            ),
        )
        .otherwise(
            F.map_from_arrays(
                F.array().cast("array<string>"), F.array().cast("array<long>")
            )
        )
        .alias("_extras"),
    )
    schema = V.Object(
        required={"id": V.Pattern(r"x-\d{6}$")},
        additional=V.Range("integer", min_value=0),
    )
    _assert_counts_match(ValidationEngine(schema, id_col="id").check(df))
    # additional=False: the extras map present → ONE object.additional
    # violation regardless of entry count
    closed = V.Object(required={"id": V.Pattern(r"x-\d{6}$")}, additional=False)
    _assert_counts_match(ValidationEngine(closed, id_col="id").check(df))


def test_verdicts_plan_prunes_violation_structs(spark):
    """The verdict aggregation must not evaluate the violation-building
    expressions at all (the counter replaces them)."""
    from valideer_spark.flagship import doc_schema
    from valideer_spark.sources import synth_docs

    report = ValidationEngine(doc_schema()).check(synth_docs(spark, 100))
    plan = (
        report.verdicts()._jdf.queryExecution().optimizedPlan().toString()
    )
    # message building pruned away (synth_docs itself uses format_string,
    # so key on the violation-message markers)
    assert "Invalid value" not in plan
    assert "missing required properties" not in plan
    assert "must be one of" not in plan
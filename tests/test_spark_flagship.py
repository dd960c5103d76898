"""M1 gate: the lowered flagship plan agrees with the kernel row-for-row —
verdicts, first-violation messages (byte-equal), and adapted span-sequence
equality on (kind, text, media_ref, order)."""

import pytest
from pyspark.sql import functions as F

from valideer_spark.core.errors import ValidationError
from valideer_spark.engine import ValidationEngine
from valideer_spark.flagship import doc_schema
from valideer_spark.plans import compile_plan
from valideer_spark.sources import synth_docs

N_DOCS = 1500


@pytest.fixture(scope="module")
def annotated_rows(spark):
    docs = synth_docs(spark, N_DOCS)
    plan = compile_plan(doc_schema(), docs)
    return plan.check(docs, adapt=True).collect()


def row_to_doc(row):
    spans = [
        {k: v for k, v in s.asDict().items() if v is not None}
        for s in (row.spans or [])
    ]
    return {"doc_id": row.doc_id, "spans": spans}


def test_verdicts_match_kernel(annotated_rows):
    schema = doc_schema()
    for row in annotated_rows:
        assert schema.is_valid(row_to_doc(row)) == row._valid, row.doc_id


def test_violations_nonempty_iff_invalid(annotated_rows):
    for row in annotated_rows:
        assert (len(row._violations) > 0) == (not row._valid)


def test_first_violation_message_byte_matches_kernel(annotated_rows):
    schema = doc_schema()
    checked = 0
    for row in annotated_rows:
        if row._valid:
            continue
        with pytest.raises(ValidationError) as exc_info:
            schema.validate(row_to_doc(row), adapt=False)
        kernel_msg = exc_info.value.to_string()
        v = row._violations[0]
        spark_msg = v["message"] + (" (at %s)" % v["path"] if v["path"] else "")
        assert spark_msg == kernel_msg
        checked += 1
    assert checked > 20  # seeded violations at ~2%


def test_adapted_span_sequence_equality(annotated_rows):
    """Per-row invariant vs the reference: span-sequence equality on
    (kind, text, media_ref, order) after adaptation (driver input_hint)."""
    schema = doc_schema()
    checked = 0
    for row in annotated_rows:
        if not row._valid:
            assert row._adapted is None
            continue
        kernel_out = schema.validate(row_to_doc(row), adapt=True)
        spark_spans = [
            (s.kind, s.text, s.media_ref, i)
            for i, s in enumerate(row._adapted.spans)
        ]
        kernel_spans = [
            (s.get("kind"), s.get("text"), s.get("media_ref"), i)
            for i, s in enumerate(kernel_out["spans"])
        ]
        assert spark_spans == kernel_spans
        checked += 1
    assert checked > 1000


def test_partition_verdicts_stable_across_parallelism(spark):
    docs8 = synth_docs(spark, N_DOCS).repartition(8)
    docs2 = synth_docs(spark, N_DOCS).repartition(2)
    eng = ValidationEngine(doc_schema(), buckets=32)
    v8 = {r["_part_id"]: (r["n_docs"], r["n_valid"]) for r in eng.check(docs8).verdicts().collect()}
    v2 = {r["_part_id"]: (r["n_docs"], r["n_valid"]) for r in eng.check(docs2).verdicts().collect()}
    assert v8 == v2  # deterministic hash bucketing, not spark_partition_id


def test_violation_rows_shape(spark):
    docs = synth_docs(spark, 500)
    report = ValidationEngine(doc_schema()).check(docs)
    rows = report.violation_rows()
    assert rows.columns == [
        "doc_id", "part_id", "violation_index", "path", "constraint", "message"
    ]
    counts = {r["constraint"]: r["count"] for r in report.metrics().collect()}
    assert counts  # seeded violations present


def test_checkpoint_resume_skips_completed(spark, tmp_path):
    docs = synth_docs(spark, 400)
    eng = ValidationEngine(doc_schema(), buckets=16, checkpoint_dir=str(tmp_path))
    first = eng.run_with_checkpoint(docs, run_id="r1")
    n_first = first.count()
    assert n_first == 16
    second = eng.run_with_checkpoint(docs, run_id="r2")
    assert second.count() == 0  # everything already checkpointed


def test_engine_recompiles_for_different_schema(spark):
    """Plan cache is keyed by frame schema — a second frame with different
    columns must not reuse the first frame's lowered plan."""
    import valideer_spark as V
    from valideer_spark.engine import ValidationEngine

    eng = ValidationEngine({"+doc_id": V.Pattern(r"k-\d+$"), "?v": "?integer"},
                           buckets=8)
    df1 = spark.createDataFrame([("k-1", 5), ("bad", 6)], "doc_id string, v long")
    r1 = eng.check(df1).annotated.collect()
    assert sorted(row._valid for row in r1) == [False, True]

    df2 = spark.createDataFrame([("k-2", 5, "x")],
                                "doc_id string, v long, extra string")
    r2 = eng.check(df2).annotated.collect()  # recompile, no stale-plan crash
    assert r2[0]._valid


def test_engine_adapted_output(spark):
    """adapted() returns only valid rows with adaptation applied
    (Nullable default fill)."""
    import valideer_spark as V
    from valideer_spark.engine import ValidationEngine

    eng = ValidationEngine(
        {"+doc_id": V.Pattern(r"k-\d+$"), "?v": V.Nullable("integer", -1)},
        buckets=8,
    )
    df = spark.createDataFrame(
        [("k-1", None), ("k-2", 7), ("nope", 1)], "doc_id string, v long"
    )
    out = {r["doc_id"]: r["v"] for r in eng.check(df).adapted().collect()}
    assert out == {"k-1": -1, "k-2": 7}  # invalid row excluded, default filled

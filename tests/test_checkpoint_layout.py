"""Checkpoint/resume storage-layout behavior + Iceberg code path.

The Iceberg runtime is absent in this container, so executable coverage
is: generated MERGE INTO SQL (exact text), availability probe, graceful
fallback; the partition-pruned resume is proven on the parquet layout
(same pruning mechanics Iceberg applies from table metadata).
"""

import pytest
from pyspark.sql import functions as F

from valideer_spark.engine import ValidationEngine, write_partitioned
from valideer_spark.flagship import doc_schema
from valideer_spark.sources import synth_docs
from valideer_spark.sources.iceberg import (
    checkpoint_merge_sql,
    iceberg_available,
    read_table,
)


def test_merge_into_sql_text():
    sql = checkpoint_merge_sql(
        "ckpt.partition_checkpoints", "src", key_cols=("part_id",),
        update_cols=("n_docs", "pass", "run_id"),
    )
    assert sql == (
        "MERGE INTO ckpt.partition_checkpoints t\n"
        "USING src s\n"
        "ON t.part_id = s.part_id\n"
        "WHEN MATCHED THEN UPDATE SET t.n_docs = s.n_docs, t.pass = s.pass, "
        "t.run_id = s.run_id\n"
        "WHEN NOT MATCHED THEN INSERT (part_id, n_docs, pass, run_id) "
        "VALUES (s.part_id, s.n_docs, s.pass, s.run_id)"
    )


def test_read_table_parquet_fallback_and_guard(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(5).write.parquet(p)
    assert read_table(spark, p).count() == 5
    with pytest.raises(ValueError):
        read_table(spark, p, snapshot_id=42)  # time travel needs iceberg


def test_iceberg_probe_and_skip(spark):
    if iceberg_available(spark):
        pytest.skip("iceberg present: exercised by the deployment suite")
    # without jars the engine must not touch iceberg paths implicitly
    eng = ValidationEngine(doc_schema(), checkpoint_format="iceberg",
                           checkpoint_table="nope.ckpt")
    assert eng.completed_partitions(spark) is None  # graceful, no raise


def test_resume_prunes_partitioned_scan(spark, tmp_path):
    """With the write_partitioned layout, a resumed run filters _part_id
    at the SOURCE: completed buckets appear in PartitionFilters and the
    scan reads zero rows when everything is checkpointed."""
    docs = synth_docs(spark, 400)
    data_path = str(tmp_path / "docs_bucketed")
    write_partitioned(docs, data_path, buckets=8)

    eng = ValidationEngine(
        doc_schema(), buckets=8, checkpoint_dir=str(tmp_path / "ckpt")
    )
    stored = spark.read.parquet(data_path)
    first = eng.run_with_checkpoint(stored, run_id="r1")
    assert first.count() == 8

    done = [r["part_id"] for r in eng.completed_partitions(spark).collect()]
    resumed_scan = spark.read.parquet(data_path).filter(
        ~F.col("_part_id").isin(done)
    )
    plan = resumed_scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_part_id" in plan.split(
        "PartitionFilters"
    )[1][:200]

    second = eng.run_with_checkpoint(spark.read.parquet(data_path), run_id="r2")
    assert second.count() == 0  # nothing left to validate


def test_resume_partial_progress(spark, tmp_path):
    """Seed a checkpoint covering half the buckets; the resumed run
    validates exactly the other half."""
    docs = synth_docs(spark, 400)
    data_path = str(tmp_path / "docs_bucketed")
    write_partitioned(docs, data_path, buckets=8)
    eng = ValidationEngine(
        doc_schema(), buckets=8, checkpoint_dir=str(tmp_path / "ckpt")
    )
    stored = spark.read.parquet(data_path)
    half = stored.filter(F.col("_part_id") < 4)
    assert eng.run_with_checkpoint(half, run_id="r1").count() == 4

    rest = eng.run_with_checkpoint(stored, run_id="r2")
    got = sorted(r["part_id"] for r in rest.collect())
    assert got == [4, 5, 6, 7]


def test_checkpoint_lineage_columns(spark, tmp_path):
    """Checkpoint rows carry full lineage: run id, timestamps, measured
    wall seconds, and the input-file fingerprint (stable across runs of
    the same files, distinct for different inputs)."""
    docs = synth_docs(spark, 200)
    p = str(tmp_path / "docs")
    docs.write.parquet(p)
    eng = ValidationEngine(doc_schema(), buckets=4,
                           checkpoint_dir=str(tmp_path / "ck"))
    out = eng.run_with_checkpoint(spark.read.parquet(p), run_id="r1")
    rows = out.collect()
    assert {"run_id", "completed_at", "input_fingerprint", "wall_secs"} <= set(out.columns)
    assert all(r["wall_secs"] > 0 for r in rows)
    fps = {r["input_fingerprint"] for r in rows}
    assert len(fps) == 1 and list(fps)[0] != ""


def test_reserved_columns_not_validated(spark, tmp_path):
    """A bucketed layout's _part_id (and re-check artifacts) are engine
    columns, not document properties: a closed schema must not flag them."""
    from valideer_spark import core as V
    from valideer_spark.plans import compile_plan

    df = spark.range(5).selectExpr("CAST(id AS STRING) AS doc_id",
                                   "CAST(id % 2 AS INT) AS _part_id")
    plan = compile_plan(
        V.Object(required={"doc_id": "string"}, additional=False), df
    )
    out = plan.check(df, adapt=False)
    assert all(r["_valid"] for r in out.collect())


def test_resume_with_custom_partition_expr_does_not_source_prune(spark, tmp_path):
    """A custom partition_expr must DISABLE stored-_part_id source
    pruning: the layout on disk is xxhash-bucketed (write_partitioned),
    so its directories do not correspond to the custom buckets — pruning
    on them would silently skip pending rows (regression for the
    mismatched-bucketing data-loss hazard)."""
    docs = synth_docs(spark, 400)
    data_path = str(tmp_path / "docs_bucketed")
    write_partitioned(docs, data_path, buckets=8)  # xxhash64 layout

    suffix_mod = lambda c: F.pmod(  # noqa: E731
        F.substring(c, 5, 12).cast("long"), F.lit(8)
    ).cast("int")
    eng = ValidationEngine(
        doc_schema(),
        buckets=8,
        partition_expr=suffix_mod,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    stored = spark.read.parquet(data_path)
    # run 1: complete custom buckets 0-3 only (filter on the RECOMPUTED
    # custom bucket, independent of the stored layout)
    part1 = stored.filter(suffix_mod(F.col("doc_id")) < 4)
    first = eng.run_with_checkpoint(part1, run_id="r1")
    assert first.count() == 4

    # run 2 over the FULL stored layout: exactly the docs of custom
    # buckets 4-7 must be validated — with stored-column pruning active,
    # rows whose STORED xxhash bucket collides with a completed custom id
    # would be skipped before validation and this count would come short
    expected = stored.filter(suffix_mod(F.col("doc_id")) >= 4).count()
    second = eng.run_with_checkpoint(stored, run_id="r2")
    rows = second.collect()
    assert {r["part_id"] for r in rows} == {4, 5, 6, 7}
    assert sum(r["n_docs"] for r in rows) == expected


def test_non_total_partition_expr_converges_via_sentinel(spark, tmp_path):
    """A custom partition_expr that yields NULL for some ids (non-total)
    must still converge: NULL bucket ids coalesce to the sentinel bucket
    -1, so those rows checkpoint like any other bucket and a re-run over
    the same input validates nothing (regression for the
    revalidate-forever hazard)."""
    docs = synth_docs(spark, 300)

    # partial expr: even numeric suffixes bucket normally, odd -> NULL
    def partial(c):
        n = F.substring(c, 5, 12).cast("long")
        return F.when(n % 2 == 0, F.pmod(n, F.lit(4)).cast("int"))

    eng = ValidationEngine(
        doc_schema(),
        buckets=4,
        partition_expr=partial,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    first = eng.run_with_checkpoint(docs, run_id="r1")
    parts = {r["part_id"] for r in first.collect()}
    assert -1 in parts  # the NULL rows landed in the sentinel bucket
    assert sum(r["n_docs"] for r in first.collect()) == 300

    # identical re-run: everything (sentinel included) is checkpointed
    second = eng.run_with_checkpoint(docs, run_id="r2")
    assert second.count() == 0


def test_partition_expr_emitting_reserved_sentinel_raises(spark, tmp_path):
    """Bucket -1 is RESERVED as the NULL sentinel: a custom
    partition_expr that legitimately emits -1 would silently merge those
    rows into the sentinel bucket (and checkpoint them at its
    granularity), so the engine raises mid-job instead (documented
    partition_expr contract)."""
    docs = synth_docs(spark, 50)

    def collides(c):
        n = F.substring(c, 5, 12).cast("long")
        return (F.pmod(n, F.lit(4)) - F.lit(1)).cast("int")  # emits -1

    eng = ValidationEngine(
        doc_schema(),
        buckets=4,
        partition_expr=collides,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception, match="reserved bucket id -1"):
        eng.run_with_checkpoint(docs, run_id="r1")

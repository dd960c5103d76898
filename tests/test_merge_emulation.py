"""Executable MERGE INTO semantics without the Iceberg runtime.

The north-star checkpoint contract is an Iceberg table maintained with
``MERGE INTO`` keyed by partition id (sources/iceberg.py). The jars are
absent from this container, so the SQL text alone was the only evidence
until round 4; ``merge_checkpoint_emulated`` now EXECUTES the same
matched→update / not-matched→insert semantics on the parquet fallback
layout, and the engine's ``checkpoint_format='iceberg'`` path uses it
transparently when the runtime is missing (one row per partition,
last-run-wins — versus the plain-parquet format's append-with-history).
"""

import pytest
from pyspark.sql import functions as F

from valideer_spark.engine import ValidationEngine
from valideer_spark.flagship import doc_schema
from valideer_spark.sources import synth_docs
from valideer_spark.sources.iceberg import (
    iceberg_available,
    merge_checkpoint_emulated,
)


def test_merge_emulated_upsert_semantics(spark, tmp_path):
    path = str(tmp_path / "ckpt")
    r1 = spark.createDataFrame(
        [(1, 10, "r1"), (2, 20, "r1")], "part_id int, n_docs long, run_id string"
    )
    out1 = merge_checkpoint_emulated(spark, path, r1)
    assert sorted(tuple(r) for r in out1.collect()) == [
        (1, 10, "r1"), (2, 20, "r1"),
    ]

    # matched key 2 updates in place, new key 3 inserts, key 1 untouched
    r2 = spark.createDataFrame(
        [(2, 99, "r2"), (3, 30, "r2")], "part_id int, n_docs long, run_id string"
    )
    out2 = merge_checkpoint_emulated(spark, path, r2)
    assert sorted(tuple(r) for r in out2.collect()) == [
        (1, 10, "r1"), (2, 99, "r2"), (3, 30, "r2"),
    ]

    # idempotent re-merge: same source, same table after (the property
    # that makes re-run-after-crash safe — the reason MERGE beats append)
    out3 = merge_checkpoint_emulated(spark, path, r2)
    assert sorted(tuple(r) for r in out3.collect()) == [
        (1, 10, "r1"), (2, 99, "r2"), (3, 30, "r2"),
    ]

    # the merged table is what a fresh reader sees
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == [
        (1, 10, "r1"), (2, 99, "r2"), (3, 30, "r2"),
    ]


def test_engine_iceberg_checkpoint_emulated(spark, tmp_path):
    """checkpoint_format='iceberg' without jars: the engine executes the
    MERGE semantics on the parquet layout under checkpoint_dir — resume
    converges, and the checkpoint holds ONE row per partition (last run
    wins), not an append history."""
    if iceberg_available(spark):
        pytest.skip("iceberg present: real MERGE path covered elsewhere")

    docs = synth_docs(spark, 300)
    eng = ValidationEngine(
        doc_schema(),
        buckets=8,
        checkpoint_format="iceberg",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    first = eng.run_with_checkpoint(docs, run_id="r1")
    assert first.count() == 8
    assert {r["run_id"] for r in first.collect()} == {"r1"}

    # full re-run: everything checkpointed -> nothing revalidated
    second = eng.run_with_checkpoint(docs, run_id="r2")
    assert second.count() == 0

    # one row per partition, not 8 + history
    stored = eng.completed_partitions(spark)
    assert stored is not None
    assert stored.count() == 8

    # checkpoint granularity is the BUCKET (documented contract): new
    # docs landing in already-completed buckets are skipped on resume
    more = synth_docs(spark, 600)
    third = eng.run_with_checkpoint(more, run_id="r3")
    assert third.count() == 0
    assert eng.completed_partitions(spark).count() == 8  # still one/bucket


def test_engine_iceberg_without_dir_still_graceful(spark):
    """No jars AND no checkpoint_dir: nothing to fall back to — the probe
    behavior (return None, no raise) is preserved."""
    if iceberg_available(spark):
        pytest.skip("iceberg present")
    eng = ValidationEngine(
        doc_schema(), checkpoint_format="iceberg", checkpoint_table="nope.ckpt"
    )
    assert eng.completed_partitions(spark) is None

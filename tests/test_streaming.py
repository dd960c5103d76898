"""Structured Streaming incremental validation: two file drops, exactly-once
micro-batch outputs, resume via Spark's streaming checkpoint."""

import os

from pyspark.sql import functions as F

from valideer_spark.flagship import doc_schema
from valideer_spark.sources import synth_docs
from valideer_spark.sources.docs import DOCS_SCHEMA
from valideer_spark.streaming import IncrementalValidator


def test_incremental_validation(spark, tmp_path):
    input_dir = str(tmp_path / "incoming")
    output_dir = str(tmp_path / "out")
    os.makedirs(input_dir)

    docs = synth_docs(spark, 600)
    first = docs.filter(
        F.regexp_extract("doc_id", r"doc-(\d{12})", 1).cast("long") < 300
    )
    first.coalesce(1).write.mode("append").parquet(input_dir)

    iv = IncrementalValidator(doc_schema(), DOCS_SCHEMA, output_dir)
    verdicts1 = iv.run_available(spark, input_dir)
    batch1_docs = verdicts1.agg(F.sum("n_docs")).collect()[0][0]
    assert batch1_docs == first.count()

    # second drop: only the NEW file is processed (streaming checkpoint)
    second = docs.subtract(first)
    second.coalesce(1).write.mode("append").parquet(input_dir)
    verdicts_all = iv.run_available(spark, input_dir)
    assert verdicts_all.agg(F.sum("n_docs")).collect()[0][0] == 600
    batch_ids = sorted(
        r["batch_id"] for r in verdicts_all.select("batch_id").distinct().collect()
    )
    assert len(batch_ids) == 2

    viol = spark.read.parquet(os.path.join(output_dir, "violations"))
    assert viol.count() > 0
    assert "message" in viol.columns


def test_stateful_dedup_stream(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: duplicates arriving in a
    LATER micro-batch are dropped (state survives across batches)."""
    import pandas as pd

    input_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    os.makedirs(input_dir)

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("text", T.StringType())]
    )

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)

    def run_available():
        from valideer_spark.streaming import dedup_stream

        stream = spark.readStream.schema(schema).parquet(input_dir)
        q = (
            dedup_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    drop([("a", "hello world"), ("b", "hello   WORLD"), ("c", "unique one")])
    out1 = run_available()
    # a and b normalize identically -> one emission (smallest id wins)
    got1 = {r["doc_id"] for r in out1.collect()}
    assert got1 == {"a", "c"}

    # batch 2: re-send a duplicate of batch 1 + one new doc
    drop([("d", "HELLO world"), ("e", "fresh content")])
    out2 = run_available()
    got2 = {r["doc_id"] for r in out2.collect()}
    assert got2 == {"a", "c", "e"}  # d dropped: key seen in batch 1

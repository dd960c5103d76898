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

"""Example cluster job for spark-submit (M4 packaging proof).

    spark-submit --py-files dist/valideer_spark.zip tools/submit_job.py

Validates a synthetic docs table, prints one JSON result line. On a real
cluster the same file runs with ``--master yarn/k8s`` and an Iceberg
``spark.read.format("iceberg")`` source.
"""

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    spark = SparkSession.builder.appName("valideer-spark-job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from valideer_spark.engine import ValidationEngine
    from valideer_spark.flagship import doc_schema
    from valideer_spark.sources import synth_docs

    docs = synth_docs(spark, 50_000)
    report = ValidationEngine(doc_schema()).check(docs)
    totals = report.verdicts().agg(
        F.sum("n_docs").alias("n_docs"), F.sum("n_valid").alias("n_valid")
    ).collect()[0]
    n_violations = report.violation_rows().count()
    print(json.dumps({
        "n_docs": int(totals["n_docs"]),
        "n_valid": int(totals["n_valid"]),
        "n_violation_rows": int(n_violations),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

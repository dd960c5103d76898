"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship interleaved-docs validation end-to-end on
sf0.001; ``queries``/``oracle_sql`` expose the engine's operators for the
DuckDB cross-check (see ``valideer_spark/queries.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: validate the synthetic interleaved docs table with
    the compiled flagship schema and return the violation rows
    (doc_id, part_id, violation_index, path, constraint, message)."""
    from valideer_spark.engine import ValidationEngine
    from valideer_spark.flagship import doc_schema
    from valideer_spark.sources import synth_docs

    docs = synth_docs(spark, 2000)
    report = ValidationEngine(doc_schema()).check(docs)
    return report.violation_rows()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from valideer_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from valideer_spark.queries import ORACLES

    return dict(ORACLES)

"""Test-data table loading (parquet fallback for the Iceberg deployment).

In production the engine reads Iceberg (``spark.read.format("iceberg")``,
snapshot + partition pruning from table metadata); this sandbox reads the
driver-generated parquet at ``/root/testdata/sf*`` (TESTDATA.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, name: str, directory: str | None = None) -> DataFrame:
    directory = directory or sf_dir()
    return spark.read.parquet(os.path.join(directory, f"{name}.parquet"))

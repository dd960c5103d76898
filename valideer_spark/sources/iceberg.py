"""Iceberg table support (scan, snapshot time travel, checkpoint MERGE).

The target deployment (BASELINE north star) reads/writes Iceberg tables:
snapshot-pruned scans, time-travel drift comparisons, and a checkpoint
table maintained with ``MERGE INTO`` keyed by partition id. This sandbox
container ships no Iceberg jars, so every entry point:

* detects availability at runtime (:func:`iceberg_available`) instead of
  import-failing, and
* degrades to the parquet layout used everywhere else in the repo, keeping
  the API (and the generated SQL, which IS unit-tested) identical — and,
  since round 4, the MERGE semantics themselves stay EXECUTABLE:
  :func:`merge_checkpoint_emulated` performs the same keyed upsert on the
  parquet layout, so ``ValidationEngine(checkpoint_format='iceberg')``
  runs end-to-end (one row per partition, last run wins) with or without
  the jars (tests/test_merge_emulation.py).

On a real cluster, enable with the standard session configs::

    spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
    spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession,
    identifier: str,
    fmt: str = "parquet",
    snapshot_id: Optional[int] = None,
    as_of_timestamp: Optional[int] = None,
) -> DataFrame:
    """Scan a table; Iceberg gets snapshot/time-travel options, parquet is
    the sandbox fallback (``identifier`` is a path).

    Snapshot pruning note: with ``fmt='iceberg'`` the returned scan prunes
    both partitions and files from table metadata before any task launches;
    predicate/column pushdown applies identically to both branches.
    """
    if fmt == "iceberg":
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", str(as_of_timestamp))
        return reader.load(identifier)
    if snapshot_id is not None or as_of_timestamp is not None:
        raise ValueError("time travel requires fmt='iceberg'")
    return spark.read.parquet(identifier)


def checkpoint_merge_sql(
    target: str,
    source_view: str,
    key_cols: Sequence[str] = ("part_id",),
    update_cols: Sequence[str] = (
        "n_docs", "n_valid", "n_violations", "pass", "run_id", "completed_at",
    ),
) -> str:
    """The Iceberg ``MERGE INTO`` statement maintaining the partition
    checkpoint table: one row per partition id, last completed run wins.

    Unit-testable without jars; executed verbatim by
    :func:`merge_checkpoint` when the runtime is present.
    """
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
    cols = ", ".join([*key_cols, *update_cols])
    vals = ", ".join(f"s.{c}" for c in [*key_cols, *update_cols])
    return (
        f"MERGE INTO {target} t\n"
        f"USING {source_view} s\n"
        f"ON {on}\n"
        f"WHEN MATCHED THEN UPDATE SET {sets}\n"
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def merge_checkpoint(
    spark: SparkSession,
    target: str,
    verdicts: DataFrame,
    key_cols: Sequence[str] = ("part_id",),
) -> None:
    """Upsert verdict rows into the Iceberg checkpoint table.

    The source is a few hundred rows (<= engine buckets), so the MERGE's
    join broadcasts; conflicts resolve per partition key (idempotent
    re-runs — the reason MERGE beats blind append at scale).
    """
    update_cols = [c for c in verdicts.columns if c not in key_cols]
    view = "checkpoint_merge_source"
    verdicts.createOrReplaceTempView(view)
    spark.sql(checkpoint_merge_sql(target, view, key_cols, update_cols))


def merge_checkpoint_emulated(
    spark: SparkSession,
    path: str,
    verdicts: DataFrame,
    key_cols: Sequence[str] = ("part_id",),
) -> DataFrame:
    """EXECUTE ``MERGE INTO`` semantics on a parquet directory — the
    sandbox twin of :func:`merge_checkpoint`, byte-equivalent to the SQL
    :func:`checkpoint_merge_sql` generates: WHEN MATCHED (same
    ``key_cols``) the stored row is replaced by the incoming one, WHEN
    NOT MATCHED it is inserted; untouched keys survive. Returns the
    merged table as a DataFrame.

    The checkpoint is driver-bounded BY DESIGN (one row per engine
    bucket, <= a few hundred), so both sides materialize on the driver
    and the directory is rewritten in one overwrite — the same
    single-writer assumption the engine's append path already makes.
    Idempotent: re-merging the same source is a no-op."""
    import os

    fields = verdicts.schema.fields
    names = [f.name for f in fields]

    def as_tuple(row):
        return tuple(row[n] for n in names)

    new_rows = [as_tuple(r) for r in verdicts.collect()]
    new_keys = {tuple(r[names.index(k)] for k in key_cols) for r in new_rows}
    kept = []
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        stored = spark.read.parquet(path)
        if set(stored.columns) != set(names):
            raise ValueError(
                "checkpoint schema drift: stored columns %s vs incoming %s"
                % (sorted(stored.columns), sorted(names))
            )
        kept = [
            as_tuple(r)
            for r in stored.collect()
            if tuple(r[k] for k in key_cols) not in new_keys
        ]
    merged = spark.createDataFrame(kept + new_rows, verdicts.schema)
    merged.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)

"""Set-operation constraints: snapshot-vs-snapshot domain comparison.

``domain_diff`` compares the distinct value domain of a column across two
snapshots (new values appeared / old values vanished) — the categorical
analog of the quantile-drift check, built on distinct + anti-join
(exceptAll semantics without the full-row shuffle of DataFrame.exceptAll:
we reduce to the distinct domain first, so the set op runs on |domain|
rows, not |table| rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def domain_values(df: DataFrame, column: str) -> DataFrame:
    return df.select(F.col(column).alias("value")).filter(
        F.col("value").isNotNull()
    ).distinct()


def domain_diff(
    snapshot_a: DataFrame, snapshot_b: DataFrame, column: str
) -> DataFrame:
    """(value, status) rows where status ∈ {'added', 'removed'}:
    'added' = in B but not A, 'removed' = in A but not B."""
    a = domain_values(snapshot_a, column)
    b = domain_values(snapshot_b, column)
    added = b.join(a, "value", "left_anti").select(
        "value", F.lit("added").alias("status")
    )
    removed = a.join(b, "value", "left_anti").select(
        "value", F.lit("removed").alias("status")
    )
    return added.unionAll(removed)

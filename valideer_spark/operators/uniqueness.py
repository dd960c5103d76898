"""Uniqueness constraint: duplicate-key detection with explicit skew
handling.

Plain ``groupBy(key).count()`` melts a reducer when one key holds 10^8
duplicates (the hot doc_id prefix case, FIXTURES.md §A). The salted
two-phase plan bounds any single reducer's input at ``rows(key)/salt``:

    phase 1: groupBy(key, hash(row) % salt)  → partial counts (map-side
             combine still applies within each salt bucket)
    phase 2: groupBy(key) over ≤ salt partial rows per key → total

AQE skew-join splitting handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(
    df: DataFrame,
    key: str,
    salt: int = 0,
    min_count: int = 2,
) -> DataFrame:
    """Keys appearing ``>= min_count`` times → (key, dup_count).

    ``salt > 1`` enables the two-phase salted aggregation for skewed keys;
    ``salt=0`` uses the single-phase hash agg (fine when AQE is on and no
    key dominates).
    """
    if salt and salt > 1:
        # deterministic row-salt: any per-row expression works; use a hash
        # of the full row's monotonically increasing id-free content proxy.
        salted = df.select(
            F.col(key),
            F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(salt)).alias("_salt"),
        )
        partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
        totals = partial.groupBy(key).agg(F.sum("_c").alias("dup_count"))
    else:
        totals = df.groupBy(key).agg(F.count(F.lit(1)).alias("dup_count"))
    return totals.filter(F.col("dup_count") >= min_count)

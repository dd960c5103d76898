"""Referential-integrity constraints as anti-joins.

Small reference tables are broadcast (hash join, no shuffle of the fact
side); large ones fall back to sort-merge with AQE skew splitting. The
violating side is always the fact table: rows whose foreign key has no
match in the reference relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_rows(
    fact: DataFrame,
    fact_key: str,
    ref: DataFrame,
    ref_key: str,
    broadcast_ref: bool = True,
) -> DataFrame:
    """Fact rows whose ``fact_key`` does not exist in ``ref.ref_key``.

    NULL foreign keys are not orphans (SQL semantics: nothing to refer to);
    use a NonNullable column check for null enforcement.
    """
    r = ref.select(F.col(ref_key).alias("__ref_key")).distinct()
    if broadcast_ref:
        r = F.broadcast(r)
    return fact.filter(F.col(fact_key).isNotNull()).join(
        r, F.col(fact_key) == F.col("__ref_key"), "left_anti"
    )


def orphan_keys(
    fact: DataFrame,
    fact_key: str,
    ref: DataFrame,
    ref_key: str,
    broadcast_ref: bool = True,
) -> DataFrame:
    """Distinct violating keys with occurrence counts (smaller output than
    :func:`orphan_rows` — aggregate first, then anti-join the distinct
    keys, which shrinks the join's left side to |distinct keys|)."""
    keys = (
        fact.filter(F.col(fact_key).isNotNull())
        .groupBy(fact_key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    r = ref.select(F.col(ref_key).alias("__ref_key")).distinct()
    if broadcast_ref:
        r = F.broadcast(r)
    return keys.join(r, F.col(fact_key) == F.col("__ref_key"), "left_anti")

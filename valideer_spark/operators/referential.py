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


def salted_orphan_rows(
    fact: DataFrame,
    fact_key: str,
    ref: DataFrame,
    ref_key: str,
    salt: int = 16,
) -> DataFrame:
    """Skew-proof anti-join for a NON-broadcastable reference: the fact
    side gets a per-row salt, the reference side is exploded ``salt``
    ways, and the join keys on (key, salt) — a hot foreign key (one
    doc_id prefix holding 10^8 rows) spreads over ``salt`` reducers
    instead of melting one.

    Use when the reference is too large to broadcast AND the fact keys
    are skewed beyond what AQE's skew-join splitting handles (AQE splits
    by partition size after the fact; explicit salting bounds the
    partition up front). Cost: |ref| × salt shuffle rows on the reference
    side — acceptable when |ref| ≪ |fact|, which is the referential-check
    shape.
    """
    salted_fact = fact.filter(F.col(fact_key).isNotNull()).withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int"),
    )
    exploded_ref = (
        ref.select(F.col(ref_key).alias("__ref_key"))
        .distinct()
        .select(
            "__ref_key",
            F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt"),
        )
    )
    return salted_fact.join(
        exploded_ref,
        (F.col(fact_key) == F.col("__ref_key"))
        & (salted_fact["__salt"] == exploded_ref["__salt"]),
        "left_anti",
    ).drop("__salt")


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

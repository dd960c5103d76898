"""Per-column statistics constraints (null rate, min/max, distinct).

One single-pass hash aggregation (Spark computes partial aggregates
map-side automatically); no shuffle beyond the final single-group reduce.
At 100 TB this is scan-bound: column pruning ensures only profiled columns
are read from parquet/Iceberg.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    approx_distinct: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Long-format per-column profile: one output row per column with
    count / null count / null rate / min / max (stringified) and
    (optionally) approximate distinct count via HyperLogLog++.

    Single aggregation over the frame; the per-column stats are stacked
    driver-side from one result row (no extra jobs).
    """
    columns = list(columns or df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
        if approx_distinct:
            aggs.append(F.approx_count_distinct(col, rsd).alias(f"{c}__dv"))
    wide = df.agg(*aggs)

    stacks = []
    for c in columns:
        fields = [
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_null"),
            (F.col(f"{c}__nulls") / F.col("__n")).alias("null_rate"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        ]
        if approx_distinct:
            fields.append(F.col(f"{c}__dv").alias("approx_distinct"))
        stacks.append(F.struct(*fields))
    return (
        wide.select(F.explode(F.array(*stacks)).alias("s"))
        .select("s.*")
    )


def column_histogram(
    df: DataFrame,
    column: str,
    bins: int,
    min_value: float,
    max_value: float,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: (bucket, n) with bucket
    0 = below range, bins+1 = above (width_bucket semantics). One
    map-side-combinable aggregation on a ≤ bins+2-key group — shuffle is
    O(bins), not O(rows); empty buckets are omitted."""
    b = F.width_bucket(F.col(column), F.lit(min_value), F.lit(max_value), F.lit(bins))
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def top_values(
    df: DataFrame, column: str, k: int = 10
) -> DataFrame:
    """Exact top-k most frequent values of a column: hash agg then
    TakeOrderedAndProject (per-partition top-k + k-row driver merge, no
    full sort). Ties break by value for determinism."""
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("value"))
        .limit(k)
    )


def count_min_table(
    df: DataFrame, column: str, depth: int = 5, width: int = 2048
) -> DataFrame:
    """Count-min sketch as a (d, w, cnt) counter table — the approximate,
    bounded-shuffle twin of :func:`top_values` for heavy-hitter queries
    over columns whose exact groupBy would shuffle billions of distinct
    keys.

    Each value increments one counter per depth row (hash seeded by the
    row index); the shuffle carries at most depth × width keys regardless
    of input size, and two sketch tables built on different inputs merge
    by summing counters (Cormode & Muthukrishnan 2005). Guarantees with
    seed-fixed hashes: estimate >= true count always; estimate <= true +
    (e/width) * N with probability 1 - exp(-depth)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(F.lit(d), F.col(column)), F.lit(width))
                .cast("int")
                .alias("w"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.filter(F.col(column).isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.w").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimates(
    cms: DataFrame,
    values: DataFrame,
    column: str,
    depth: int = 5,
    width: int = 2048,
) -> DataFrame:
    """Point-query a count-min table for each value in ``values[column]``:
    est = min over depth rows of the addressed counter (0 when the cell
    was never touched). Broadcast-joins the KB-size sketch — no rescan of
    the sketched input.

    NULL probe values are excluded (mirroring :func:`count_min_table`,
    which never adds NULLs to the sketch): xxhash64 ignores a NULL
    argument, so a NULL would otherwise address the seed-only cells and
    return a meaningless collision-based estimate instead of absent."""
    values = values.filter(F.col(column).isNotNull())
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(F.lit(d), F.col(column)), F.lit(width))
                .cast("int")
                .alias("w"),
            )
            for d in range(depth)
        ]
    )
    addressed = values.select(
        F.col(column).alias("value"), F.explode(cells).alias("c")
    ).select("value", F.col("c.d").alias("d"), F.col("c.w").alias("w"))
    return (
        addressed.join(F.broadcast(cms), ["d", "w"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def count_min_merge(*tables: DataFrame) -> DataFrame:
    """Merge count-min tables built with the SAME (depth, width, column
    seeds) — e.g. one per Iceberg snapshot or per corpus shard — by
    summing counters cell-wise. The merged table answers point queries
    over the union of the sketched inputs; O(depth × width) rows
    throughout."""
    assert tables, "need at least one sketch table"
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))

"""Distribution-drift constraints across snapshots.

Two quantile paths:

* :func:`quantile_drift` — built-in ``percentile_approx`` (Greenwald-
  Khanna variant, JVM-side, mergeable) compared between two snapshots.
* :func:`tdigest_quantiles` — mergeable t-digest sketches built per
  partition group with an Arrow-batched ``applyInPandas`` (numpy inside,
  no per-row Python), merged algebraically. The per-group digests are a
  few KB each, so the final merge is a trivially small reduce.

Drift score = max |q_a - q_b| over the probed quantiles, optionally
normalized by the snapshot-A IQR (a location/scale-robust PSI stand-in).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_PROBS = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]


# ---------------------------------------------------------------------------
# merging t-digest (scale function k1; deterministic, mergeable)
# ---------------------------------------------------------------------------

def _tdigest_compress(
    means: np.ndarray, weights: np.ndarray, compression: float
) -> Tuple[np.ndarray, np.ndarray]:
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_means: List[float] = []
    out_weights: List[float] = []
    cur_mean, cur_w = float(means[0]), float(weights[0])
    w_so_far = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q0 = w_so_far / total
        q2 = (w_so_far + cur_w + w) / total
        # k0-style scale bound: a cluster may hold at most this much weight
        # given how close it sits to the distribution tails
        limit = 4.0 * total * min(q2, 1.0 - q0) / compression
        if cur_w + w <= max(limit, 1.0):
            cur_mean = (cur_mean * cur_w + float(m) * float(w)) / (cur_w + w)
            cur_w += float(w)
        else:
            out_means.append(cur_mean)
            out_weights.append(cur_w)
            w_so_far += cur_w
            cur_mean, cur_w = float(m), float(w)
    out_means.append(cur_mean)
    out_weights.append(cur_w)
    return np.asarray(out_means), np.asarray(out_weights)


def tdigest_build(values: np.ndarray, compression: float = 200.0):
    values = np.asarray(values, dtype=np.float64)
    values = values[~np.isnan(values)]
    if values.size == 0:
        return np.array([]), np.array([])
    return _tdigest_compress(values, np.ones_like(values), compression)


def tdigest_merge(
    digests: Sequence[Tuple[np.ndarray, np.ndarray]], compression: float = 200.0
):
    means = np.concatenate([d[0] for d in digests if len(d[0])]) if digests else np.array([])
    weights = np.concatenate([d[1] for d in digests if len(d[1])]) if digests else np.array([])
    if means.size == 0:
        return np.array([]), np.array([])
    return _tdigest_compress(means, weights, compression)


def tdigest_quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    cum = np.cumsum(weights) - weights / 2.0
    target = q * weights.sum()
    return float(np.interp(target, cum, means))


_DIGEST_SCHEMA = T.StructType(
    [
        T.StructField("group_id", T.IntegerType()),
        T.StructField("means", T.ArrayType(T.DoubleType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
    ]
)


def tdigest_sketch_table(
    df: DataFrame,
    column: str,
    compression: float = 200.0,
    groups: int = 64,
) -> DataFrame:
    """Distributed t-digest sketch TABLE: hash-bucket rows into ``groups``,
    one mergeable digest per bucket via applyInPandas (Arrow/numpy).

    This is the persistable artifact for snapshot drift at scale: write
    one sketch table per Iceberg snapshot (a few KB × groups, regardless
    of input size), then compare any two snapshots WITHOUT rescanning
    them (:func:`drift_between_sketch_tables`). The digests merge
    algebraically, so sketch tables from different partitionings/cluster
    sizes compose."""
    import pandas as pd

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = tdigest_build(pdf[column].to_numpy(), compression)
        return pd.DataFrame(
            {
                "group_id": [int(pdf["_g"].iloc[0]) if len(pdf) else 0],
                "means": [m.tolist()],
                "weights": [w.tolist()],
            }
        )

    bucketed = df.select(column).withColumn(
        "_g", F.pmod(F.xxhash64(F.col(column)), F.lit(groups)).cast("int")
    )
    return bucketed.groupBy("_g").applyInPandas(build, schema=_DIGEST_SCHEMA)


def merge_sketch_table(
    sketches: DataFrame, compression: float = 200.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Collect and algebraically merge a sketch table (KB-size rows — the
    documented mergeable-sketch pattern, not a data collect)."""
    digests = sketches.collect()
    return tdigest_merge(
        [(np.asarray(r["means"]), np.asarray(r["weights"])) for r in digests],
        compression,
    )


def tdigest_quantiles(
    df: DataFrame,
    column: str,
    probs: Sequence[float] = tuple(DEFAULT_PROBS),
    compression: float = 200.0,
    groups: int = 64,
) -> List[float]:
    """One-shot distributed t-digest quantiles (build + merge +
    interpolate); see :func:`tdigest_sketch_table` for the persisted
    snapshot-drift variant."""
    merged_m, merged_w = merge_sketch_table(
        tdigest_sketch_table(df, column, compression, groups), compression
    )
    return [tdigest_quantile(merged_m, merged_w, q) for q in probs]


def drift_between_sketch_tables(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    probs: Sequence[float] = tuple(DEFAULT_PROBS),
    compression: float = 200.0,
) -> List[Tuple[float, float, float, float]]:
    """Quantile drift between two PERSISTED sketch tables (e.g. written at
    two Iceberg snapshots): rows of (prob, q_a, q_b, abs_diff) computed
    from the merged digests — no rescan of either snapshot."""
    ma, wa = merge_sketch_table(sketch_a, compression)
    mb, wb = merge_sketch_table(sketch_b, compression)
    out = []
    for p in probs:
        qa = tdigest_quantile(ma, wa, p)
        qb = tdigest_quantile(mb, wb, p)
        out.append((p, qa, qb, abs(qa - qb)))
    return out


def quantile_drift(
    snapshot_a: DataFrame,
    snapshot_b: DataFrame,
    column: str,
    probs: Sequence[float] = tuple(DEFAULT_PROBS),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-quantile comparison of one column across two snapshots using the
    JVM mergeable GK sketch; returns (prob, q_a, q_b, abs_diff)."""
    probs = list(probs)

    def side(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.percentile_approx(column, probs, accuracy).alias(name)
        )

    a = side(snapshot_a, "qa")
    b = side(snapshot_b, "qb")
    joined = a.crossJoin(b)
    return joined.select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(p) for p in probs]).alias("prob"),
                F.col("qa").alias("q_a"),
                F.col("qb").alias("q_b"),
            )
        ).alias("z")
    ).select(
        F.col("z.prob").alias("prob"),
        F.col("z.q_a").alias("q_a"),
        F.col("z.q_b").alias("q_b"),
        F.abs(F.col("z.q_a") - F.col("z.q_b")).alias("abs_diff"),
    )


def psi_drift(
    snapshot_a: DataFrame,
    snapshot_b: DataFrame,
    column: str,
    breaks: Sequence[float],
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index over FIXED bucket breaks — the standard
    production drift score, exact and SQL-reproducible (unlike the sketch
    paths, which are approximate by construction).

    ``len(breaks) + 1`` buckets: bucket i = number of breaks the value
    exceeds. NULLs are excluded (PSI is defined over observed values).
    Per side: one bounded-key aggregation — shuffle is O(buckets), never
    O(rows), so the plan is 100 TB-safe by the same argument as
    column_histogram. Returns one row per bucket:
    (bucket, n_a, n_b, psi_term double) with
    ``psi_term = (pa - pb) * ln(pa / pb)`` on eps-floored shares;
    sum(psi_term) is the PSI. Drift rule of thumb: < 0.1 stable,
    0.1-0.25 moderate, > 0.25 shifted.
    """
    breaks = list(breaks)
    n_buckets = len(breaks) + 1

    def bucketed(df: DataFrame, name: str) -> DataFrame:
        b = F.lit(0)
        for cut in breaks:
            b = b + (F.col(column) > F.lit(float(cut))).cast("int")
        return (
            df.filter(F.col(column).isNotNull())
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    a = bucketed(snapshot_a, "n_a")
    b = bucketed(snapshot_b, "n_b")
    all_buckets = a.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    joined = (
        all_buckets.join(F.broadcast(a), "bucket", "left")
        .join(F.broadcast(b), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    # the joined frame is n_buckets rows — window totals are free here
    from pyspark.sql import Window

    w = Window.partitionBy()
    pa = F.greatest(F.col("n_a") / F.sum("n_a").over(w), F.lit(float(eps)))
    pb = F.greatest(F.col("n_b") / F.sum("n_b").over(w), F.lit(float(eps)))
    term = (pa - pb) * F.log(pa / pb)
    return joined.select(
        "bucket", "n_a", "n_b", term.alias("psi_term")
    ).orderBy("bucket")


def drift_across_snapshots(
    spark,
    path: str,
    column: str,
    version_a: int = None,
    version_b: int = None,
    mode: str = "quantile",
    probs: Sequence[float] = tuple(DEFAULT_PROBS),
    breaks: Sequence[float] = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Distribution drift of ``column`` compared ACROSS SNAPSHOTS of one
    table — the north-star integration of the drift operators with the
    snapshot log: both sides are read with
    :func:`valideer_spark.sources.iceberg.read_table(version=...)`, so
    on a real Iceberg runtime this is two ``snapshot-id`` time-travel
    scans and in the sandbox it is the jarless numbered-snapshot twin
    retained by ``merge_checkpoint_emulated(keep_snapshots=N)``.

    Defaults compare the two most recent retained versions
    (``version_a`` = previous, ``version_b`` = latest). ``mode``:

    * ``"quantile"`` — :func:`quantile_drift` rows
      (prob, q_a, q_b, abs_diff) via the mergeable GK sketch.
    * ``"psi"`` — :func:`psi_drift` rows (bucket, n_a, n_b, psi_term)
      over caller-fixed ``breaks`` (required).

    Reference parity note: the reference library validates one value at
    a time and has no notion of table history; this operator is part of
    the mandated engine surface (BASELINE.json north_star: "distribution-
    drift checks via t-digest quantile sketches compared across
    snapshots").
    """
    from valideer_spark.sources.iceberg import read_table, snapshot_versions

    if version_a is None or version_b is None:
        versions = snapshot_versions(spark, path)
        if len(versions) < 2:
            raise ValueError(
                "drift_across_snapshots needs two retained snapshots of %s "
                "(have %s); merge with keep_snapshots>=2 or pass explicit "
                "versions" % (path, versions)
            )
        if version_b is None:
            version_b = versions[-1]
        if version_a is None:
            version_a = versions[-2] if versions[-1] == version_b else versions[-1]
    side_a = read_table(spark, path, fmt=fmt, version=version_a)
    side_b = read_table(spark, path, fmt=fmt, version=version_b)
    if mode == "quantile":
        return quantile_drift(side_a, side_b, column, probs=probs)
    if mode == "psi":
        if breaks is None:
            raise ValueError("mode='psi' requires explicit bucket breaks")
        return psi_drift(side_a, side_b, column, breaks)
    raise ValueError("mode must be 'quantile' or 'psi', got %r" % mode)

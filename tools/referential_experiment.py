"""Round-6 experiment: join-strategy variants for the referential anti-join
at sf1.0 scale (9M fact span refs vs ~7M-key catalog). Guide §3.1: the
forced broadcast of a multi-million-row ref builds the hash relation
single-threaded on the driver inside the timed region — measure it against
planner-chosen strategies.

Variants (same result set, count-asserted equal):
  forced_bcast   — current orphan_keys (F.broadcast(ref.distinct()))
  planner        — no hint: static estimate + AQE decide
  planner_shj    — no hint + preferSortMergeJoin=false (allow shuffled hash)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_N_DOCS", "2000000"))
REPEAT = int(os.environ.get("REPEAT", "3"))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from valideer_spark.conf import recommended_conf

    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("referential-experiment")
    )
    for k, v in recommended_conf(target_partitions=max(CPUS, 32)).items():
        builder = builder.config(k, v)
    # experiment toggles happen per-variant below via spark.conf.set
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from valideer_spark.sources import synth_docs, synth_media_catalog

    docs = synth_docs(spark, N_DOCS)
    docs.persist()
    docs.count()
    catalog = synth_media_catalog(spark, N_DOCS)
    catalog.persist()
    catalog.count()
    refs = docs.select(F.explode("spans").alias("s")).select(
        F.col("s.media_ref").alias("media_ref")
    )

    def keys_side():
        return (
            refs.filter(F.col("media_ref").isNotNull())
            .groupBy("media_ref")
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )

    def forced_bcast():
        r = F.broadcast(
            catalog.select(F.col("media_ref").alias("__ref_key")).distinct()
        )
        return keys_side().join(
            r, F.col("media_ref") == F.col("__ref_key"), "left_anti"
        )

    def planner():
        r = catalog.select(F.col("media_ref").alias("__ref_key")).distinct()
        return keys_side().join(
            r, F.col("media_ref") == F.col("__ref_key"), "left_anti"
        )

    variants = {
        "forced_bcast": (forced_bcast, {}),
        "planner": (planner, {}),
        "planner_shj": (
            planner,
            {
                "spark.sql.join.preferSortMergeJoin": "false",
                "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "256m",
            },
        ),
    }

    results = {}
    counts = {}
    for name, (fn, confs) in variants.items():
        old = {}
        for k, v in confs.items():
            old[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        spark.sparkContext.setJobDescription(f"referential: {name}")
        # warm
        c = fn().count()
        counts[name] = c
        best = None
        for _ in range(REPEAT):
            t0 = time.time()
            fn().count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        results[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert len(set(counts.values())) == 1, counts
    print(json.dumps({"n_docs": N_DOCS, "orphan_count": counts, "best_sec": results}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Headline benchmark: prints ONE JSON line.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

The target metric (BASELINE.json) is validated docs/sec over the
interleaved docs table — reported in the `docs_per_sec` extras — while the
required `value` field is total suite wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# ~2M docs per unit scale factor → 200k docs at sf0.1 (~900k spans)
SF = float(os.environ.get("SPARK_GRAFT_SF", SF_DIR.rstrip("/").split("sf")[-1] or "0.1"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_N_DOCS", str(max(20_000, int(2_000_000 * SF)))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from valideer_spark.conf import recommended_conf

    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .appName("valideer-spark-bench")
    )
    for k, v in recommended_conf(target_partitions=max(CPUS, 32)).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from valideer_spark.engine import ValidationEngine
    from valideer_spark.flagship import doc_schema
    from valideer_spark.operators import (
        column_profile,
        duplicate_keys,
        orphan_keys,
        quantile_drift,
    )
    from valideer_spark.sources import synth_docs, synth_media_catalog
    from valideer_spark.sources.tables import load_table

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    best_of = int(os.environ.get("SPARK_GRAFT_BEST_OF", "2"))

    def timed(name: str, fn):
        """Best-of-K timing (the host is shared; a single sample can be
        5x off under external load). `value` below sums the best
        per-query times, i.e. the suite's achievable wall time."""
        best = None
        out = None
        for _ in range(best_of):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        return out

    docs = synth_docs(spark, N_DOCS)
    # materialize the input once so validation timing excludes synthesis
    docs.persist()
    n_rows = timed("docs_materialize", lambda: docs.count())

    engine = ValidationEngine(doc_schema())

    # warm-up: compile the plan, trigger codegen + JIT on a small slice
    warm = synth_docs(spark, 2000)
    engine.check(warm).verdicts().collect()
    ValidationEngine(doc_schema()).check(warm).violation_rows().count()

    report = engine.check(docs)
    verdict_totals = timed(
        "flagship_verdicts",
        lambda: report.verdicts()
        .agg(F.sum("n_docs"), F.sum("n_valid"))
        .collect()[0],
    )
    n_viol = timed("flagship_violations", lambda: report.violation_rows().count())
    check_secs = timings["flagship_verdicts"] + timings["flagship_violations"]
    extras["docs_per_sec"] = round(n_rows / check_secs, 1)
    # the BASELINE.json metric: validated docs/sec, constraint-eval
    # (verdict + per-partition violation counts in one scan)
    extras["constraint_eval_docs_per_sec"] = round(
        n_rows / timings["flagship_verdicts"], 1
    )
    extras["n_docs"] = n_rows
    extras["n_valid"] = int(verdict_totals[1])
    extras["n_violations"] = int(n_viol)

    # predicate-only fast path (adapt=False analog: is_valid counts)
    def run_fastpath():
        plan = engine.plan_for(docs)
        return docs.select(
            F.sum(plan.is_valid_col(docs).cast("long"))
        ).collect()[0][0]

    timed("flagship_fastpath", run_fastpath)
    extras["fastpath_docs_per_sec"] = round(n_rows / timings["flagship_fastpath"], 1)

    timed(
        "uniqueness_salted",
        lambda: duplicate_keys(docs, "doc_id", salt=16).count(),
    )

    # materialize the reference catalog outside the timed region: the
    # timing isolates the engine's anti-join, not test-data synthesis
    catalog = synth_media_catalog(spark, N_DOCS)
    catalog.persist()
    catalog.count()
    refs = docs.select(F.explode("spans").alias("s")).select(
        F.col("s.media_ref").alias("media_ref")
    )
    timed(
        "referential_media",
        lambda: orphan_keys(refs, "media_ref", catalog, "media_ref").count(),
    )
    catalog.unpersist()

    li = load_table(spark, "lineitem", SF_DIR)
    timed(
        "stats_lineitem",
        lambda: column_profile(
            li,
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_partkey"],
        ).count(),
    )

    part = load_table(spark, "part", SF_DIR)
    timed(
        "referential_lineitem_part",
        lambda: orphan_keys(
            li, "l_partkey", part.filter(F.col("p_partkey") % 7 != 0), "p_partkey"
        ).count(),
    )

    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    timed(
        "drift_percentiles",
        lambda: quantile_drift(a, b, "l_extendedprice").count(),
    )

    docs.unpersist()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "validation+constraint suite wall time (docs/sec in extras)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF,
                # timing methodology: each query runs best_of times in one
                # JVM and reports its BEST (warm page cache / warm JIT) —
                # comparable across rounds since every round uses the same
                # protocol, but not to a cold single-sample run
                "timing": f"best-of-{best_of} warm, single JVM",
                "extras": extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

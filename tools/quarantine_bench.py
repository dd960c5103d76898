"""Quarantine-at-scale timing (VERDICT r4 #8): validate-then-route cost.

Measures, on the sf0.1-scale synthetic docs frame (~200k docs, ~5%
violation rate):
  1. verdict-only baseline (single scan, counters),
  2. write_quarantine end-to-end (valid rows -> parquet, invalid rows +
     exploded violation_* columns -> parquet).

The claim under test: validate-then-route costs ~one extra scan plus the
parquet write, not a plan blow-up (the violation struct/message
expressions are CASE-guarded, so valid rows never pay them).

Run in a probe-qualified window (tools/dram_probe.py) with nothing else
on the box.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.driver.memory", "100g")
        .config("spark.sql.shuffle.partitions", str(max(32, cpus)))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from valideer_spark.engine import ValidationEngine, write_quarantine
    from valideer_spark.flagship import doc_schema
    from valideer_spark.sources import synth_docs

    tmp = tempfile.mkdtemp(prefix="quarantine_bench_")
    docs_path = tmp + "/docs"
    synth_docs(spark, n_docs).write.parquet(docs_path)
    docs = spark.read.parquet(docs_path)

    engine = ValidationEngine(doc_schema())
    report = engine.check(docs)  # compiles the plan once

    # warm-up + baseline: verdict counters only (single scan)
    t0 = time.time()
    totals = report.annotated.agg(
        F.count(F.lit(1)), F.sum(F.col("_n_violations").cast("long"))
    ).collect()[0]
    verdict_s = time.time() - t0

    t0 = time.time()
    write_quarantine(report, tmp + "/valid", tmp + "/quarantine")
    quarantine_s = time.time() - t0

    n_valid = spark.read.parquet(tmp + "/valid").count()
    n_quarantined_rows = spark.read.parquet(tmp + "/quarantine").count()
    print(
        json.dumps(
            {
                "n_docs": int(totals[0]),
                "n_violations": int(totals[1]),
                "verdict_only_s": round(verdict_s, 2),
                "write_quarantine_s": round(quarantine_s, 2),
                "ratio": round(quarantine_s / verdict_s, 2),
                "n_valid_written": n_valid,
                "n_quarantine_rows": n_quarantined_rows,
                "cpus": cpus,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

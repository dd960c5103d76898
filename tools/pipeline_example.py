"""End-to-end training-data pipeline composed from the engine's operators
— the shape a 100 TB corpus run takes, executed here on the synthetic
tables:

1. schema-validate the interleaved docs (flagship check plan) and keep
   valid docs with checkpointed per-partition lineage;
2. exact-dedup survivors (content-hash groups, first id wins);
3. quality-filter the text corpus and drop near-duplicates found by
   MinHash LSH + exact-Jaccard verification;
4. attach language + token counts; write the curated corpus partitioned
   by the deterministic bucket (resume-friendly layout).

Run: python tools/pipeline_example.py [n_docs]
Prints one JSON line with per-stage counts and seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from valideer_spark.conf import recommended_conf
    from valideer_spark.engine import ValidationEngine, write_partitioned
    from valideer_spark.flagship import doc_schema
    from valideer_spark.operators import language_guess, quality_score, token_count
    from valideer_spark.operators.dedup import (
        jaccard_verify_candidates,
        minhash_lsh_candidates,
        normalized_text,
    )
    from valideer_spark.sources import synth_docs

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    b = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
    )
    for k, v in recommended_conf().items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="vs_pipeline_")
    stages: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        stages[name] = round(time.time() - t0, 2)
        return out

    # 1. validate with checkpointed lineage
    docs = synth_docs(spark, n_docs)
    engine = ValidationEngine(doc_schema(), checkpoint_dir=os.path.join(work, "ck"))
    report = engine.check(docs)
    valid = report.annotated.filter(F.col("_valid")).select("doc_id", "spans")
    counts["input"] = n_docs
    counts["valid"] = timed("validate", lambda: valid.count())
    engine.run_with_checkpoint(docs, run_id="pipeline")

    # 2. exact dedup on the concatenated text spans (first doc_id wins)
    text = valid.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.filter("spans", lambda s: s.getField("text").isNotNull()),
                lambda s: s.getField("text"),
            ),
            " ",
        ).alias("text"),
    )
    from pyspark.sql.window import Window

    keyed = text.withColumn("ck", F.xxhash64(normalized_text(F.col("text"))))
    w = Window.partitionBy("ck").orderBy("doc_id")
    deduped = (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    counts["after_exact_dedup"] = timed("exact_dedup", lambda: deduped.count())

    # 3. near-dup removal: MinHash LSH candidates -> exact Jaccard >= 0.9,
    # drop the larger id of each verified pair
    cands = minhash_lsh_candidates(deduped, "text", "doc_id")
    near = jaccard_verify_candidates(
        deduped, cands, "text", "doc_id", threshold_num=9, threshold_den=10
    )
    to_drop = near.select(F.col("b_id").alias("doc_id")).distinct()
    survivors = deduped.join(F.broadcast(to_drop), "doc_id", "left_anti")
    counts["after_near_dedup"] = timed("near_dedup", lambda: survivors.count())

    # 4. quality filter + annotations + resume-friendly write.
    # NB: doc_id is NOT unique here (the synthesizer seeds a hot duplicate
    # key); the post-dedup content key ck IS unique, so annotations join
    # on it — joining on a non-unique key would explode the hot key.
    q = quality_score(survivors, "text", "ck")
    lang = language_guess(survivors, "text", "ck")
    toks = token_count(survivors, "text", "ck")
    curated = (
        survivors.join(q, "ck")
        .join(lang, "ck")
        .join(toks, "ck")
        .filter(F.col("quality") >= 0.5)
    )
    out_path = os.path.join(work, "curated")
    timed(
        "annotate_filter_write",
        lambda: write_partitioned(curated, out_path, id_col="doc_id", buckets=64),
    )
    counts["curated"] = spark.read.parquet(out_path).count()

    print(
        json.dumps(
            {"pipeline": "validate>dedup>near-dedup>quality", "n": counts,
             "secs": stages, "total_secs": round(sum(stages.values()), 2)}
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

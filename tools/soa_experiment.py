"""Struct-of-arrays (SoA) HOF experiment.

BENCH.md's decomposition showed the flagship verdict cost is dominated by
interpreted higher-order-function evaluation that touches struct fields
inside array lambdas (`F.forall(spans, s -> s.offset >= 0)` costs ~= the
full 16-constraint verdict). Hypothesis: extracting each referenced struct
field ONCE per row as a primitive array (`spans.offset` ->
GetArrayStructFields, which IS covered by whole-stage codegen) and running
the lambdas over primitive arrays removes the per-element interpreted
struct access, without introducing any shuffle.

Variants measured on the same 10M-doc parquet (fresh lineage, best-of-K):
  A  engine          current compiled flagship verdict (per-doc ok + agg)
  B  soa             hand-written SoA rewrite of the same span predicate
  C  struct_touch    forall(spans, s -> s.offset >= 0)        (lower bound, AoS)
  D  soa_touch       forall(spans.offset, x -> x >= 0)        (lower bound, SoA)
  E  no_lambda       array_min(spans.offset) >= 0             (codegen floor)

Also cross-checks that A and B agree on n_valid.

Usage: python tools/soa_experiment.py [N_DOCS] [ITERS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
PARQUET = os.environ.get("SOA_PARQUET", f"/tmp/soa_docs_{N_DOCS}")

from valideer_spark.conf import recommended_conf  # noqa: E402

builder = (
    SparkSession.builder.master("local[32]")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
)
for k, v in recommended_conf().items():
    builder = builder.config(k, v)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

if not os.path.exists(PARQUET):
    from valideer_spark.sources import synth_docs

    synth_docs(spark, N_DOCS).repartition(64).write.mode("overwrite").parquet(PARQUET)


def fresh():
    return spark.read.parquet(PARQUET)


from valideer_spark.engine import ValidationEngine  # noqa: E402
from valideer_spark.flagship import (  # noqa: E402
    DOC_ID_PATTERN,
    MEDIA_REF_PATTERN,
    SPAN_KINDS,
    doc_schema,
)

engine = ValidationEngine(doc_schema())


def ok_engine(df):
    return engine.check(df).verdicts().agg(F.sum("n_docs"), F.sum("n_valid"))


def ok_engine_pred(df):
    from valideer_spark.plans import compile_plan

    plan = compile_plan(engine.schema, df)
    return df.select(plan.is_valid_col(df).alias("ok")).agg(
        F.count(F.lit(1)), F.sum(F.col("ok").cast("long"))
    )


def soa_ok_col():
    spans = F.col("spans")
    kinds = spans.getField("kind")        # array<string>  (GetArrayStructFields)
    offsets = spans.getField("offset")    # array<int>
    texts = spans.getField("text")        # array<string>
    refs = spans.getField("media_ref")    # array<string>

    doc_ok = F.col("doc_id").isNotNull() & F.col("doc_id").rlike(
        "^(?:" + DOC_ID_PATTERN + ")"
    )
    spans_ok = spans.isNotNull() & (F.size(spans) >= 1)
    kind_ok = F.forall(kinds, lambda k: k.isNotNull() & k.isin(SPAN_KINDS))
    offset_ok = F.forall(offsets, lambda o: o.isNotNull() & (o >= 0))
    ref_ok = F.forall(refs, lambda m: m.isNull() | m.rlike("^(?:" + MEDIA_REF_PATTERN + ")"))
    text_consistent = F.forall(
        F.zip_with(kinds, texts, lambda k, t: t.isNotNull() == (k == F.lit("text"))),
        lambda b: b,
    )
    media_consistent = F.forall(
        F.zip_with(kinds, refs, lambda k, m: m.isNotNull() == (k != F.lit("text"))),
        lambda b: b,
    )
    inner = kind_ok & offset_ok & ref_ok & text_consistent & media_consistent
    return doc_ok & F.when(spans_ok, F.coalesce(inner, F.lit(False))).otherwise(
        F.lit(False)
    )


def ok_soa(df):
    return df.select(soa_ok_col().alias("ok")).agg(
        F.count(F.lit(1)), F.sum(F.col("ok").cast("long"))
    )


def soa_fused_ok_col():
    """3-HOF fusion: each 2-field condition's zip_with absorbs the
    per-field checks of its fields; forall(bool_arr) replaced by
    ~array_contains(bool_arr, false) with null-definite lambdas."""
    spans = F.col("spans")
    kinds = spans.getField("kind")
    offsets = spans.getField("offset")
    texts = spans.getField("text")
    refs = spans.getField("media_ref")

    doc_ok = F.col("doc_id").isNotNull() & F.col("doc_id").rlike(
        "^(?:" + DOC_ID_PATTERN + ")"
    )
    spans_ok = spans.isNotNull() & (F.size(spans) >= 1)
    zw_t = F.zip_with(
        kinds,
        texts,
        lambda k, t: k.isNotNull()
        & k.isin(SPAN_KINDS)
        & (t.isNotNull() == (k == F.lit("text"))),
    )
    zw_m = F.zip_with(
        kinds,
        refs,
        lambda k, m: (m.isNotNull() == (k != F.lit("text")))
        & (m.isNull() | m.rlike("^(?:" + MEDIA_REF_PATTERN + ")")),
    )
    off_arr = F.transform(offsets, lambda o: o.isNotNull() & (o >= 0))
    inner = (
        ~F.array_contains(zw_t, F.lit(False))
        & ~F.array_contains(zw_m, F.lit(False))
        & ~F.array_contains(off_arr, F.lit(False))
    )
    return doc_ok & F.when(spans_ok, F.coalesce(inner, F.lit(False))).otherwise(
        F.lit(False)
    )


def ok_soa_fused(df):
    return df.select(soa_fused_ok_col().alias("ok")).agg(
        F.count(F.lit(1)), F.sum(F.col("ok").cast("long"))
    )


def ok_struct_touch(df):
    return df.select(
        F.forall(F.col("spans"), lambda s: s.getField("offset") >= 0).alias("ok")
    ).agg(F.count(F.lit(1)), F.sum(F.col("ok").cast("long")))


def ok_soa_touch(df):
    return df.select(
        F.forall(F.col("spans").getField("offset"), lambda o: o >= 0).alias("ok")
    ).agg(F.count(F.lit(1)), F.sum(F.col("ok").cast("long")))


def ok_no_lambda(df):
    return df.select(
        (F.array_min(F.col("spans").getField("offset")) >= 0).alias("ok")
    ).agg(F.count(F.lit(1)), F.sum(F.col("ok").cast("long")))


VARIANTS = {
    "A_engine": ok_engine,
    "A2_engine_pred": ok_engine_pred,
    "B_soa": ok_soa,
    "B2_soa_fused": ok_soa_fused,
    "C_struct_touch": ok_struct_touch,
    "D_soa_touch": ok_soa_touch,
    "E_no_lambda": ok_no_lambda,
}

# correctness cross-check: engine n_valid == SoA n_valid
n_docs, n_valid_engine = ok_engine(fresh()).collect()[0]
_, n_valid_soa = ok_soa(fresh()).collect()[0]
_, n_valid_fused = ok_soa_fused(fresh()).collect()[0]
print(
    f"n_docs={n_docs} engine_valid={n_valid_engine} "
    f"soa_valid={n_valid_soa} fused_valid={n_valid_fused}",
    flush=True,
)
assert n_valid_engine == n_valid_soa, "SoA predicate diverges from engine"
assert n_valid_engine == n_valid_fused, "fused SoA predicate diverges from engine"

results = {}
for name, fn in VARIANTS.items():
    fn(fresh()).collect()  # warm-up
    best = None
    for _ in range(ITERS):
        t0 = time.time()
        fn(fresh()).collect()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    results[name] = round(best, 2)
    print(f"{name:16s} {best:6.2f}s  {N_DOCS/best/1e6:5.2f}M docs/s", flush=True)

print(json.dumps({"n_docs": N_DOCS, "best_secs": results}))
spark.stop()

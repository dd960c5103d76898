import sys, time, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from pyspark.sql import SparkSession, functions as F
from valideer_spark.conf import recommended_conf
from scaling_bench import kernel_rate
b = (SparkSession.builder.master("local[32]")
     .config("spark.driver.memory", "24g").config("spark.ui.enabled", "false"))
for k, v in recommended_conf(target_partitions=32).items():
    b = b.config(k, v)
spark = b.getOrCreate(); spark.sparkContext.setLogLevel("ERROR")
from valideer_spark.sources import synth_docs
from valideer_spark.engine import ValidationEngine
from valideer_spark.flagship import doc_schema
docs = synth_docs(spark, 2000000); docs.persist(); docs.count()
engine = ValidationEngine(doc_schema())
plan = engine.plan_for(docs)

def cur():
    return docs.select(F.sum(plan.is_valid_col(docs).cast("long")))

MEDIA = r"(?d)^(?:media://[a-z0-9]{8}/[0-9]{1,4}$)"
def ns(p): return F.coalesce(p, F.lit(False))

def alt():
    doc_ok = (F.col("spans").isNotNull()
              & F.col("doc_id").rlike(r"(?d)^(?:doc-\d{12}$)")
              & ~ns(F.size("spans") < 1))
    staged = docs.withColumn("_rid", F.monotonically_increasing_id())
    ex = staged.select("_rid", doc_ok.alias("ok0"), F.explode_outer("spans").alias("s"))
    k = F.col("s.kind"); t = F.col("s.text"); m = F.col("s.media_ref"); o = F.col("s.offset")
    span_ok = (ns(k.isNotNull()) & ns(k.isin("table","audio","image","video","text"))
               & ns(o.isNotNull()) & ns(o >= 0)
               & (m.isNull() | ns(m.rlike(MEDIA)))
               & ns(t.isNotNull() == (k == F.lit("text")))
               & ns(m.isNotNull() == (k != F.lit("text"))))
    span_ok = F.when(F.col("s").isNull(), F.lit(True)).otherwise(span_ok)
    per_doc = ex.groupBy("_rid").agg(F.min(F.col("ok0") & span_ok).alias("v"))
    return per_doc.select(F.sum(F.col("v").cast("long")))

kernel_rate(5000); ks=[kernel_rate()]
best = {"hof": None, "explode": None}
for r in range(4):
    order = [("hof", cur), ("explode", alt)] if r % 2 == 0 else [("explode", alt), ("hof", cur)]
    for name, fn in order:
        t0=time.time(); fn().collect(); dt=time.time()-t0
        if best[name] is None or dt < best[name]: best[name] = dt
    ks.append(kernel_rate())
drift = round(1.0 - min(ks)/max(ks), 3)
print(json.dumps({"best": {k: round(v,3) for k,v in best.items()}, "kernel_drift": drift, "stable": drift < 0.15}))
spark.stop()

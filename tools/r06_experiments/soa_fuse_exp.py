import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from valideer_spark.conf import recommended_conf
b = (SparkSession.builder.master("local[32]")
     .config("spark.driver.memory", "24g").config("spark.ui.enabled", "false"))
for k, v in recommended_conf(target_partitions=32).items():
    b = b.config(k, v)
spark = b.getOrCreate(); spark.sparkContext.setLogLevel("ERROR")
from valideer_spark.sources import synth_docs
docs = synth_docs(spark, 2000000); docs.persist(); docs.count()
spans = F.col("spans")
MEDIA = r"(?d)^(?:media://[a-z0-9]{8}/[0-9]{1,4}$)"

def ns(p):  # _nullsafe
    return F.coalesce(p, F.lit(False))

def term_unary(field, b):
    arr = spans.getField(field)
    return ~F.array_contains(F.transform(arr, lambda x: ns(b(x))), F.lit(False))

def term_binary(f1, f2, b):
    return ~F.array_contains(F.zip_with(spans.getField(f1), spans.getField(f2), lambda x,y: ns(b(x,y))), F.lit(False))

enum_ok = lambda k: F.when(k.isNull(), F.lit(True)).otherwise(ns(k.isin("table","audio","image","video","text")))
pat_ok = lambda m: F.when(m.isNull(), F.lit(True)).otherwise(m.isNull() | ~ns(m.isNull() | ~m.rlike(MEDIA)))
range_ok = lambda o: F.when(o.isNull(), F.lit(True)).otherwise(o.isNotNull() & ~ns(o < 0))

# current: 7 passes
cur = (term_unary("kind", lambda x: x.isNotNull())
       & term_unary("offset", lambda x: x.isNotNull())
       & term_unary("media_ref", pat_ok)
       & term_unary("kind", enum_ok)
       & term_unary("offset", range_ok)
       & term_binary("kind", "text", lambda k,t: t.isNotNull() == (k == F.lit("text")))
       & term_binary("kind", "media_ref", lambda k,m: m.isNotNull() == (k != F.lit("text"))))

# fused: 5 passes (kind notnull+enum in one, offset notnull+range in one)
fused = (term_unary("kind", lambda x: ns(x.isNotNull()) & ns(enum_ok(x)))
         & term_unary("offset", lambda x: ns(x.isNotNull()) & ns(range_ok(x)))
         & term_unary("media_ref", pat_ok)
         & term_binary("kind", "text", lambda k,t: t.isNotNull() == (k == F.lit("text")))
         & term_binary("kind", "media_ref", lambda k,m: m.isNotNull() == (k != F.lit("text"))))

# fully fused into zip_with chains? try 3 passes: combine media_ref pattern with (kind,media) zip
fused3 = (term_binary("kind", "text", lambda k,t: (ns(k.isNotNull()) & ns(enum_ok(k))) & (t.isNotNull() == (k == F.lit("text"))))
          & term_binary("kind", "media_ref", lambda k,m: ns(pat_ok(m)) & (m.isNotNull() == (k != F.lit("text"))))
          & term_unary("offset", lambda x: ns(x.isNotNull()) & ns(range_ok(x))))

base = F.col("spans").isNotNull() & F.col("doc_id").rlike(r"(?d)^(?:doc-\d{12}$)")
guard = lambda inner: base & F.when(F.col("spans").isNull(), F.lit(True)).otherwise((F.col("spans").isNotNull() & ~ns(F.size("spans") < 1)) & ns(inner))
out = {}
for name, e in [("cur7", cur), ("fused5", fused), ("fused3", fused3)]:
    q = docs.select(F.sum(guard(e).cast("long")))
    val = q.collect()[0][0]
    best = None
    for _ in range(4):
        t0=time.time(); docs.select(F.sum(guard(e).cast("long"))).collect(); dt=time.time()-t0
        best = dt if best is None or dt < best else best
    out[name] = {"sec": round(best,3), "n_valid": val}
print(json.dumps(out))
spark.stop()

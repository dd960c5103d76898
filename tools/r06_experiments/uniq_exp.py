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
# heavy-skew corpus: 20M rows, one key holding 10M rows
skew = spark.range(20_000_000).select(
    F.when(F.col("id") % 2 == 0, F.lit("HOT")).otherwise(
        F.format_string("k-%d", F.col("id"))).alias("doc_id"))
skew.persist(); skew.count()

def salted(df, key, salt):
    s = df.select(F.col(key), F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(salt)).alias("_salt"))
    partial = s.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("dup_count")).filter(F.col("dup_count") >= 2)

def plain(df, key, salt=None):
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("dup_count")).filter(F.col("dup_count") >= 2)

out = {}
for corpus_name, df, key in [("docs2M", docs, "doc_id"), ("skew20M", skew, "doc_id")]:
    for name, fn in [("salted16", lambda d,k: salted(d,k,16)), ("plain", plain)]:
        q = fn(df, key); c = q.count()
        best = None
        for _ in range(3):
            t0 = time.time(); fn(df, key).count(); dt = time.time()-t0
            best = dt if best is None or dt < best else best
        out[f"{corpus_name}.{name}"] = {"sec": round(best,3), "rows": c}
print(json.dumps(out))
spark.stop()

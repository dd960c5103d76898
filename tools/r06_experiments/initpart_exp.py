import sys, time, json, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from valideer_spark.conf import recommended_conf
init = os.environ.get("INIT", "")
b = (SparkSession.builder.master("local[32]")
     .config("spark.driver.memory", "24g").config("spark.ui.enabled", "false"))
for k, v in recommended_conf(target_partitions=32).items():
    b = b.config(k, v)
if init:
    b = b.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", init)
spark = b.getOrCreate(); spark.sparkContext.setLogLevel("ERROR")
from valideer_spark.operators.dedup import minhash_lsh_candidates
n = 5_500_000
base = spark.range(n).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(" ", *[(F.col("id")*37+i*11).cast("string") for i in range(40)]).alias("text"))
base.persist(); base.count()
q = minhash_lsh_candidates(base, "text", "doc_id")
t0=time.time(); c=q.count(); dt=time.time()-t0
t0=time.time(); minhash_lsh_candidates(base, "text", "doc_id").count(); dt2=time.time()-t0
print(json.dumps({"init": init or "default(=32)", "pairs": c, "cold": round(dt,1), "warm": round(dt2,1)}))
spark.stop()

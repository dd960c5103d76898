import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from valideer_spark.conf import recommended_conf
import os
aqe = os.environ.get("AQE", "true")
b = (SparkSession.builder.master("local[32]")
     .config("spark.driver.memory", "24g").config("spark.ui.enabled", "false"))
for k, v in recommended_conf(target_partitions=32).items():
    b = b.config(k, v)
b = b.config("spark.sql.adaptive.enabled", aqe)
spark = b.getOrCreate(); spark.sparkContext.setLogLevel("ERROR")

# probe: expensive map-side compute -> repartition -> two consumers unioned
n = 20_000_000
base = spark.range(n).select(
    F.col("id"),
    F.sha2(F.concat_ws("-", F.col("id"), F.lit("x")), 256).alias("h"))
ex = base.repartition(F.col("h"))
c1 = ex.groupBy("h").agg(F.count(F.lit(1)).alias("c")).agg(F.sum("c"))
c2 = ex.groupBy("h").agg(F.min("id").alias("m")).agg(F.sum("m"))
one = ex.groupBy("h").agg(F.count(F.lit(1)).alias("c")).agg(F.sum("c"))

t0=time.time(); one.collect(); single=time.time()-t0
u = c1.unionAll(c2)
t0=time.time(); u.collect(); double=time.time()-t0
print(json.dumps({"aqe": aqe, "single_consumer": round(single,2), "two_consumers_union": round(double,2)}))
spark.stop()

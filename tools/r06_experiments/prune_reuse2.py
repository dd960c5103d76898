import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from valideer_spark.conf import recommended_conf
b = (SparkSession.builder.master("local[32]")
     .config("spark.driver.memory", "24g").config("spark.ui.enabled", "false"))
for k, v in recommended_conf(target_partitions=32).items():
    b = b.config(k, v)
spark = b.getOrCreate(); spark.sparkContext.setLogLevel("ERROR")
from valideer_spark.operators.dedup import jaccard_verify_candidates, minhash_lsh_candidates

n = 1_100_000
# mostly-unique corpus + 1% seeded dupes -> sparse candidate coverage
base = spark.range(n).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(" ", *[(F.col("id")*37+i*11).cast("string") for i in range(40)]).alias("text"))
dupes = spark.range(n//100).select(
    (F.lit(5_000_000)+F.col("id")).alias("doc_id"),
    F.concat_ws(" ", *[(F.col("id")*100*37+i*11).cast("string") for i in range(40)]).alias("text"))
df = base.unionAll(dupes); df.persist(); df.count()

cand = minhash_lsh_candidates(df, "text", "doc_id")  # UNPERSISTED

# plan-reuse evidence: small count() + inspect executed plan of same QE via noop-free route
q = jaccard_verify_candidates(df, cand, "text", "doc_id", threshold_num=1, threshold_den=1, prune=True)
t0=time.time(); npairs = q.count(); dt_warm=time.time()-t0
out = {"pairs": npairs, "first_prune_true": round(dt_warm,2)}
times = {}
for name, pr in [("prune_true", True), ("prune_false", False), ("prune_true2", True)]:
    qq = jaccard_verify_candidates(df, cand, "text", "doc_id", threshold_num=1, threshold_den=1, prune=pr)
    t0=time.time(); qq.count(); times[name]=round(time.time()-t0,2)
out["times"] = times
# structural reuse check on the optimized plan: how many copies of the LSH
# final agg subtree does the prune=True plan contain?
qq = jaccard_verify_candidates(df, cand, "text", "doc_id", threshold_num=1, threshold_den=1, prune=True)
p = qq._jdf.queryExecution().executedPlan().toString()
out["cand_agg_copies_in_plan"] = p.count("output=[a_id")
print(json.dumps(out))
spark.stop()

import sys, time, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from pyspark.sql import SparkSession, functions as F, Window
from valideer_spark.conf import recommended_conf
from scaling_bench import kernel_rate
b = (SparkSession.builder.master("local[32]")
     .config("spark.driver.memory", "24g").config("spark.ui.enabled", "false"))
for k, v in recommended_conf(target_partitions=32).items():
    b = b.config(k, v)
spark = b.getOrCreate(); spark.sparkContext.setLogLevel("ERROR")
from valideer_spark.operators.dedup import minhash_signatures

def buckets_of(df, num_hashes=64, bands=32):
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, "text", "doc_id", num_hashes, 3, 42)
    band_cols = F.array(*[
        F.xxhash64(F.lit(i), *[F.element_at("signature", i*rows_per_band+j+1)
                               for j in range(rows_per_band)])
        for i in range(bands)])
    return sigs.select("id", F.explode(band_cols).alias("bucket"))

def expand(grouped):
    ids = F.col("_ids"); m = F.size(ids)
    all_pairs = F.flatten(F.transform(ids, lambda x, i: F.transform(
        F.slice(ids, i + F.lit(2), m),
        lambda y: F.struct(x.alias("a_id"), y.alias("b_id")))))
    return (grouped.select(F.explode(all_pairs).alias("_p"))
            .select(F.col("_p.a_id").alias("a_id"), F.col("_p.b_id").alias("b_id")))

def finish(pairs):
    return pairs.filter(F.col("a_id") != F.col("b_id")).groupBy("a_id","b_id").agg(F.count(F.lit(1)).alias("n_bands_hit"))

def v_inline(df, cap):  # round-5 shape
    grouped = buckets_of(df).groupBy("bucket").agg(F.array_sort(F.collect_list("id")).alias("_ids"))
    ids = F.col("_ids"); m = F.size(ids)
    all_pairs = F.flatten(F.transform(ids, lambda x, i: F.transform(
        F.slice(ids, i + F.lit(2), m),
        lambda y: F.struct(x.alias("a_id"), y.alias("b_id")))))
    star = F.transform(F.slice(ids, F.lit(2), m),
        lambda y: F.struct(F.element_at(ids, 1).alias("a_id"), y.alias("b_id")))
    pairs_arr = F.when(m <= F.lit(cap), all_pairs).otherwise(star)
    pairs = (grouped.select(F.explode(pairs_arr).alias("_p"))
             .select(F.col("_p.a_id").alias("a_id"), F.col("_p.b_id").alias("b_id")))
    return finish(pairs)

def v_window(df, cap):  # current impl shape
    buckets = buckets_of(df)
    w = Window.partitionBy("bucket")
    tagged = buckets.select("id","bucket",
        F.count(F.lit(1)).over(w).alias("_m"), F.min("id").over(w).alias("_min_id"))
    cold = tagged.filter(F.col("_m") <= cap).select("id","bucket")
    grouped = cold.groupBy("bucket").agg(F.array_sort(F.collect_list("id")).alias("_ids"))
    hot = tagged.filter(F.col("_m") > cap).select(F.col("_min_id").alias("a_id"), F.col("id").alias("b_id"))
    return finish(expand(grouped).unionAll(hot))

def v_window1(df, cap):  # single-branch: star edges inside the grouped expansion
    buckets = buckets_of(df)
    w = Window.partitionBy("bucket")
    tagged = buckets.select("id","bucket",
        F.count(F.lit(1)).over(w).alias("_m"), F.min("id").over(w).alias("_min_id"))
    # hot rows become 1-row "pair shells" aggregated nowhere: route BOTH through
    # one select of pre-built pair arrays, exploding per row:
    pairs = tagged.select(
        F.when(F.col("_m") > cap,
               F.array(F.struct(F.col("_min_id").alias("a_id"), F.col("id").alias("b_id"))))
         .otherwise(F.array().cast("array<struct<a_id:long,b_id:long>>")).alias("_hp"),
        "id","bucket","_m")
    hot = pairs.select(F.explode("_hp").alias("_p")).select(F.col("_p.a_id").alias("a_id"), F.col("_p.b_id").alias("b_id"))
    cold = tagged.filter(F.col("_m") <= cap).select("id","bucket")
    grouped = cold.groupBy("bucket").agg(F.array_sort(F.collect_list("id")).alias("_ids"))
    return finish(expand(grouped).unionAll(hot))

n = 1_100_000
base = spark.range(n).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(" ", *[F.format_string("w%d", (F.col("id")+i) % 5000) for i in range(40)]).alias("text"))
base.persist(); base.count()
hotdf = spark.range(1_000_000).select(
    (F.lit(10_000_000)+F.col("id")).alias("doc_id"),
    F.lit("hot alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike nov osc papa").alias("text"))
stress = base.unionAll(hotdf)

kernel_rate(5000); ks = [kernel_rate()]
out = {}
# interleaved order, warm best-of-2
for rnd in range(2):
    for name, fn, corpus in [
        ("inline.nohot", v_inline, base), ("window.nohot", v_window, base),
        ("inline.stress", v_inline, stress), ("window.stress", v_window, stress),
    ]:
        t0=time.time(); c = fn(corpus, 50).count(); dt=time.time()-t0
        k = f"{name}"
        if k not in out or dt < out[k]["sec"]:
            out[k] = {"sec": round(dt,2), "pairs": c}
        ks.append(kernel_rate())
drift = round(1.0 - min(ks)/max(ks), 3)
print(json.dumps({"results": out, "kernel_drift": drift, "stable": drift < 0.15}))
spark.stop()

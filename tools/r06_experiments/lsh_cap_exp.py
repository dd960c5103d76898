import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from valideer_spark.conf import recommended_conf
b = (SparkSession.builder.master("local[32]")
     .config("spark.driver.memory", "24g").config("spark.ui.enabled", "false"))
for k, v in recommended_conf(target_partitions=32).items():
    b = b.config(k, v)
spark = b.getOrCreate(); spark.sparkContext.setLogLevel("ERROR")
from valideer_spark.operators.dedup import minhash_signatures, minhash_lsh_candidates

def old_capped(df, text_col, id_col, num_hashes, bands, max_bucket):
    """Inline reconstruction of the round-5 capped path (collect_list all
    buckets, CASE star for wide ones)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, 3, 42)
    band_cols = F.array(*[
        F.xxhash64(F.lit(i), *[F.element_at("signature", i*rows_per_band+j+1)
                               for j in range(rows_per_band)])
        for i in range(bands)])
    buckets = sigs.select("id", F.explode(band_cols).alias("bucket"))
    grouped = buckets.groupBy("bucket").agg(F.array_sort(F.collect_list("id")).alias("_ids"))
    ids = F.col("_ids"); m = F.size(ids)
    all_pairs = F.flatten(F.transform(ids, lambda x, i: F.transform(
        F.slice(ids, i + F.lit(2), m),
        lambda y: F.struct(x.alias("a_id"), y.alias("b_id")))))
    star = F.transform(F.slice(ids, F.lit(2), m),
        lambda y: F.struct(F.element_at(ids, 1).alias("a_id"), y.alias("b_id")))
    pairs_arr = F.when(m <= F.lit(max_bucket), all_pairs).otherwise(star)
    pairs = (grouped.select(F.explode(pairs_arr).alias("_p"))
             .select(F.col("_p.a_id").alias("a_id"), F.col("_p.b_id").alias("b_id"))
             .filter(F.col("a_id") != F.col("b_id")))
    return pairs.groupBy("a_id", "b_id").agg(F.count(F.lit(1)).alias("n_bands_hit"))

def corpus(n, hot):
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[F.format_string("w%d", (F.col("id")+i) % 2000) for i in range(30)]).alias("text"))
    hotdf = spark.range(hot).select(
        (F.lit(10_000_000)+F.col("id")).alias("doc_id"),
        F.lit("hot alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike nov osc papa").alias("text"))
    return base.unionAll(hotdf)

# equivalence at small scale
small = corpus(20000, 3000); small.persist(); small.count()
a = old_capped(small, "text", "doc_id", 64, 32, 50)
bq = minhash_lsh_candidates(small, "text", "doc_id", num_hashes=64, bands=32, max_bucket=50)
ra = sorted(map(tuple, a.collect())); rb = sorted(map(tuple, bq.collect()))
print("equal:", ra == rb, "rows:", len(ra))
small.unpersist()

# stress: 1M identical docs + 200k normal
big = corpus(200000, 1_000_000); big.persist(); big.count()
out = {}
for name, fn in [("old_capped", lambda: old_capped(big, "text", "doc_id", 64, 32, 50)),
                 ("new_capped", lambda: minhash_lsh_candidates(big, "text", "doc_id", num_hashes=64, bands=32, max_bucket=50)),
                 ]:
    t0 = time.time(); n = fn().count(); dt = time.time()-t0
    out[name] = {"sec": round(dt,2), "pairs": n}
print(json.dumps(out))
spark.stop()

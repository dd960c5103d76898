"""Scratch: M1 flagship lowering smoke test + kernel agreement."""
import os, sys, time
sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from valideer_spark.flagship import doc_schema
from valideer_spark.plans import compile_plan
from valideer_spark.sources import synth_docs

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .appName("smoke-m1")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = synth_docs(spark, 3000)
schema = doc_schema()
plan = compile_plan(schema, docs)

t0 = time.time()
annotated = plan.check(docs, adapt=False)
counts = annotated.groupBy("_valid").count().collect()
print("verdict counts:", {r["_valid"]: r["count"] for r in counts}, "in %.1fs" % (time.time() - t0))

# violations sample
vr = plan.violation_rows(docs, id_cols=["doc_id"])
vr.groupBy("constraint").count().orderBy("constraint").show(30, False)
vr.orderBy("doc_id", "violation_index").show(8, False)

# kernel agreement on a sample
rows = annotated.select("doc_id", "spans", "_valid", "_violations").limit(3000).collect()
def row_to_doc(row):
    spans = [
        {k: v for k, v in s.asDict().items() if v is not None}
        for s in (row.spans or [])
    ]
    return {"doc_id": row.doc_id, "spans": spans}

from valideer_spark.core.errors import ValidationError
mismatch = 0
msg_mismatch = 0
checked_msgs = 0
for row in rows:
    doc = row_to_doc(row)
    kernel_valid = schema.is_valid(doc)
    if kernel_valid != row._valid:
        mismatch += 1
        if mismatch <= 5:
            print("VERDICT MISMATCH", row.doc_id, "kernel:", kernel_valid, "spark:", row._valid, doc)
    if not kernel_valid and row._violations:
        try:
            schema.validate(doc, adapt=False)
        except ValidationError as ex:
            checked_msgs += 1
            kmsg = ex.to_string()
            smsg = row._violations[0]["message"]
            spath = row._violations[0]["path"]
            full = smsg + (" (at %s)" % spath if spath else "")
            if kmsg != full:
                msg_mismatch += 1
                if msg_mismatch <= 5:
                    print("MSG MISMATCH\n  kernel: %s\n  spark : %s" % (kmsg, full))
print("verdict mismatches:", mismatch, "/", len(rows))
print("msg mismatches:", msg_mismatch, "/", checked_msgs)
spark.stop()

"""Named engine queries + DuckDB oracle SQL (the driver correctness gate).

Every entry pairs a Spark implementation (idiomatic DataFrame ops over the
driver test tables and the deterministic synthetic docs table) with an
ANSI-SQL equivalent DuckDB runs on the same inputs. Outputs avoid computed
floats where possible so order-insensitive value hashes are stable; column
names are aliased identically on both sides.

Flagship queries rebuild the synthetic docs table inside the oracle SQL
(:func:`valideer_spark.sources.docs.synth_docs_sql`) — deterministic
modular arithmetic, no RNG — so DuckDB checks the *validation semantics*,
not just aggregates.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import ValidationEngine
from .flagship import DOC_ID_PATTERN, MEDIA_REF_PATTERN, SPAN_KINDS, doc_schema
from .operators import column_profile, duplicate_keys, orphan_keys
from .sources import synth_docs, synth_docs_sql, synth_media_catalog
from .sources.tables import load_table

FLAGSHIP_N_DOCS = 5000

_KINDS_SQL = ", ".join("'%s'" % k for k in SPAN_KINDS)
_MEDIA_FULL = "media://[a-z0-9]{8}/[0-9]{1,4}"

# span-level validity used by several oracles (mirrors the flagship schema)
_SPAN_OK = f"""(
  s.kind IN ({_KINDS_SQL})
  AND s."offset" >= 0
  AND (s.media_ref IS NULL OR regexp_full_match(s.media_ref, '{_MEDIA_FULL}'))
  AND ((s.text IS NOT NULL) = (s.kind = 'text'))
  AND ((s.media_ref IS NOT NULL) = (s.kind <> 'text'))
)"""


def _docs(spark: SparkSession) -> DataFrame:
    return synth_docs(spark, FLAGSHIP_N_DOCS)


def _docs_cte() -> str:
    return "WITH docs AS (%s)" % synth_docs_sql(FLAGSHIP_N_DOCS)


# ---------------------------------------------------------------------------
# flagship validation queries (schema-driven check plans)
# ---------------------------------------------------------------------------

def q_flagship_violation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    report = ValidationEngine(doc_schema()).check(_docs(spark))
    return (
        report.metrics()
        .select(F.col("constraint"), F.col("count").alias("n"))
        .orderBy("constraint")
    )


ORACLE_FLAGSHIP_VIOLATION_METRICS = _docs_cte() + f"""
, spans AS (SELECT doc_id, unnest(spans) AS s, len(spans) AS n_spans FROM docs)
, per_constraint AS (
  SELECT 'enum' AS "constraint", count(*) AS n FROM spans WHERE s.kind NOT IN ({_KINDS_SQL})
  UNION ALL
  SELECT 'pattern', count(*) FROM spans
    WHERE s.media_ref IS NOT NULL AND NOT regexp_full_match(s.media_ref, '{_MEDIA_FULL}')
  UNION ALL
  SELECT 'range.min', count(*) FROM spans WHERE s."offset" < 0
  UNION ALL
  SELECT 'condition:span_media_consistency', count(*) FROM spans
    WHERE NOT (((s.text IS NOT NULL) = (s.kind = 'text'))
               AND ((s.media_ref IS NOT NULL) = (s.kind <> 'text')))
  UNION ALL
  SELECT 'sequence.min_length', count(*) FROM docs WHERE len(spans) < 1
)
SELECT "constraint", n FROM per_constraint WHERE n > 0 ORDER BY "constraint"
"""


def q_flagship_doc_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    report = ValidationEngine(doc_schema()).check(_docs(spark))
    return report.annotated.select(
        F.col("doc_id"), F.col("_valid").alias("valid")
    )


ORACLE_FLAGSHIP_DOC_VERDICTS = _docs_cte() + f"""
SELECT doc_id,
  (regexp_full_match(doc_id, 'doc-\\d{{12}}')
   AND len(spans) >= 1
   AND coalesce(list_aggregate(list_transform(spans, s -> {_SPAN_OK}), 'bool_and'), TRUE)
  ) AS valid
FROM docs
"""


def q_flagship_partition_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    report = ValidationEngine(doc_schema(), buckets=64).check(_docs(spark))
    return report.verdicts().select(
        F.col("_part_id").alias("part_id"),
        "n_docs",
        "n_valid",
        F.col("pass"),
    )


def q_docs_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return duplicate_keys(_docs(spark), "doc_id", salt=8).orderBy("doc_id")


ORACLE_DOCS_UNIQUENESS = _docs_cte() + """
SELECT doc_id, count(*) AS dup_count FROM docs GROUP BY doc_id HAVING count(*) >= 2 ORDER BY doc_id
"""


def q_docs_referential_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark)
    catalog = synth_media_catalog(spark, FLAGSHIP_N_DOCS)
    refs = docs.select(F.explode("spans").alias("s")).select(
        F.col("s.media_ref").alias("media_ref")
    )
    return orphan_keys(refs, "media_ref", catalog, "media_ref").orderBy("media_ref")


ORACLE_DOCS_REFERENTIAL_MEDIA = _docs_cte() + f"""
, all_refs AS (
  SELECT s.media_ref AS media_ref
  FROM (SELECT unnest(spans) AS s FROM docs)
  WHERE s.media_ref IS NOT NULL
), catalog AS (
  SELECT DISTINCT s.media_ref AS media_ref
  FROM (SELECT doc_id, unnest(spans) AS s FROM docs)
  WHERE NOT (CAST(substr(doc_id, 5) AS BIGINT) % 131 = 0 AND CAST(substr(doc_id, 5) AS BIGINT) <> 0)
    AND s.media_ref IS NOT NULL
    AND regexp_full_match(s.media_ref, '{_MEDIA_FULL}')
)
SELECT media_ref, count(*) AS n_rows
FROM all_refs
WHERE media_ref NOT IN (SELECT media_ref FROM catalog)
GROUP BY media_ref ORDER BY media_ref
"""


# ---------------------------------------------------------------------------
# table constraints over the driver test tables
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    prof = column_profile(li, _PROFILE_COLS, approx_distinct=False)
    return prof.select(
        "column",
        "n_rows",
        "n_null",
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
    ).orderBy("column")


ORACLE_LINEITEM_PROFILE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", count(*) AS n_rows,
       sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_null,
       CAST(min({c}) AS DOUBLE) AS min_value, CAST(max({c}) AS DOUBLE) AS max_value
       FROM lineitem"""
    for c in _PROFILE_COLS
) + "\nORDER BY \"column\""


def q_orders_status_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.filter(~F.col("o_orderstatus").isin("O", "F"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


ORACLE_ORDERS_STATUS_ENUM = """
SELECT o_orderstatus, count(*) AS n FROM orders
WHERE o_orderstatus NOT IN ('O', 'F')
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_lineitem_quantity_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(
        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity")


ORACLE_LINEITEM_QUANTITY_RANGE = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_quantity < 1 OR l_quantity > 45
"""


def q_lineitem_part_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_partkey") % 7 != 0)
    return orphan_keys(li, "l_partkey", part, "p_partkey").orderBy("l_partkey")


ORACLE_LINEITEM_PART_REFERENTIAL = """
SELECT l_partkey, count(*) AS n_rows FROM lineitem
WHERE l_partkey IS NOT NULL
  AND l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey % 7 <> 0)
GROUP BY l_partkey ORDER BY l_partkey
"""


def q_orders_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    # seeded duplicates at read time: re-append keys divisible by 97
    with_dupes = orders.select("o_orderkey").unionAll(
        orders.select("o_orderkey").filter(F.col("o_orderkey") % 97 == 0)
    )
    return duplicate_keys(with_dupes, "o_orderkey", salt=8).orderBy("o_orderkey")


ORACLE_ORDERS_UNIQUENESS = """
WITH with_dupes AS (
  SELECT o_orderkey FROM orders
  UNION ALL
  SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0
)
SELECT o_orderkey, count(*) AS dup_count FROM with_dupes
GROUP BY o_orderkey HAVING count(*) >= 2 ORDER BY o_orderkey
"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "flagship_violation_metrics": q_flagship_violation_metrics,
    "flagship_doc_verdicts": q_flagship_doc_verdicts,
    "flagship_partition_verdicts": q_flagship_partition_verdicts,
    "docs_uniqueness": q_docs_uniqueness,
    "docs_referential_media": q_docs_referential_media,
    "lineitem_profile": q_lineitem_profile,
    "orders_status_enum": q_orders_status_enum,
    "lineitem_quantity_range": q_lineitem_quantity_range,
    "lineitem_part_referential": q_lineitem_part_referential,
    "orders_uniqueness": q_orders_uniqueness,
}

ORACLES: Dict[str, str] = {
    "flagship_violation_metrics": ORACLE_FLAGSHIP_VIOLATION_METRICS,
    "flagship_doc_verdicts": ORACLE_FLAGSHIP_DOC_VERDICTS,
    # flagship_partition_verdicts: xxhash64 bucketing is Spark-specific →
    # rows-only check (weaker, by design)
    "docs_uniqueness": ORACLE_DOCS_UNIQUENESS,
    "docs_referential_media": ORACLE_DOCS_REFERENTIAL_MEDIA,
    "lineitem_profile": ORACLE_LINEITEM_PROFILE,
    "orders_status_enum": ORACLE_ORDERS_STATUS_ENUM,
    "lineitem_quantity_range": ORACLE_LINEITEM_QUANTITY_RANGE,
    "lineitem_part_referential": ORACLE_LINEITEM_PART_REFERENTIAL,
    "orders_uniqueness": ORACLE_ORDERS_UNIQUENESS,
}

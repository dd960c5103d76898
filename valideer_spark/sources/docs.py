"""Deterministic synthetic "interleaved documents" table.

Shape per the driver input_hint::

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

Generation is pure Spark Column arithmetic over ``spark.range(n)`` — fully
distributed, seedless-deterministic (modular arithmetic, no RNG), so the
same ``n`` produces the same table at any parallelism, and the DuckDB
oracle can rebuild it byte-identically in SQL (:func:`synth_docs_sql`).

Injected violation classes (FIXTURES.md §A), keyed by doc index ``i``:

* v1 ``i % 101 == 0``  — span0 kind outside the enum ("figure")
* v2 ``i % 113 == 0``  — span0 is a text span with NULL text
* v3 ``i % 103 == 0``  — span1 media_ref fails the pattern with a
  *suffix-only* match ("Xmedia://…") — pins re.match start-anchor
* v3b ``i % 211 == 0`` — span1 media_ref with a 5-digit id — pins the $ end
* v4 ``i % 107 == 0``  — span0 offset = -1 (Range min violation)
* v5 ``i % 127 == 0``  — doc_id collides onto one hot key (uniqueness+skew)
* v7 ``i % 109 == 0``  — empty spans array (min_length=1)

``i == 0`` is exempt (every modulus matches 0) so the hot key itself stays
clean. Referential violations (v6) come from the media catalog side:
:func:`synth_media_catalog` omits refs of docs with ``i % 131 == 0``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ["text", "image", "audio", "video", "table"]

SPAN_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_SCHEMA)),
    ]
)

HOT_DOC_ID = "doc-000000000042"


def synth_docs(spark: SparkSession, n_docs: int, violations: bool = True) -> DataFrame:
    """Build the documents table with ``n_docs`` rows (+~0.8% seeded dupes)."""
    df = spark.range(n_docs).withColumnRenamed("id", "i")
    i = F.col("i")

    def is_v(mod: int):
        return (i % mod == 0) & (i != 0)

    v1, v2, v3, v3b, v4, v5, v7 = (
        is_v(101), is_v(113), is_v(103), is_v(211), is_v(107), is_v(127), is_v(109)
    )
    if not violations:
        v1 = v2 = v3 = v3b = v4 = v5 = v7 = F.lit(False)

    n_spans = F.when(v7, F.lit(0)).otherwise((i % 8 + 1).cast("int"))

    kinds_arr = F.array(*[F.lit(k) for k in KINDS])

    def span(j):
        kind = F.element_at(kinds_arr, ((i + 2 * j) % 5 + 1).cast("int"))
        kind = F.when(v1 & (j == 0), F.lit("figure")).otherwise(kind)
        kind = F.when(v2 & (j == 0), F.lit("text")).otherwise(kind)
        is_text = kind == "text"
        text = F.when(
            is_text, F.format_string("txt-%d-%d snippet", i, j)
        ).otherwise(F.lit(None).cast("string"))
        text = F.when(v2 & (j == 0), F.lit(None).cast("string")).otherwise(text)
        media = F.when(
            ~is_text,
            F.format_string(
                "media://%08x/%d", (i * 97 + j) % 4294967296, (i + j) % 9999 + 1
            ),
        ).otherwise(F.lit(None).cast("string"))
        media = F.when(
            v3 & (j == 1), F.lit("Xmedia://deadbeef/123")
        ).otherwise(media)
        media = F.when(
            v3b & (j == 2), F.lit("media://deadbeef/12345")
        ).otherwise(media)
        offset = (j * (i % 17 + 1)).cast("int")
        offset = F.when(v4 & (j == 0), F.lit(-1)).otherwise(offset)
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media.alias("media_ref"),
            offset.alias("offset"),
        )

    spans = F.when(n_spans == 0, F.array().cast(T.ArrayType(SPAN_SCHEMA))).otherwise(
        F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    )

    doc_id = F.when(v5, F.lit(HOT_DOC_ID)).otherwise(
        F.format_string("doc-%012d", i)
    )

    return df.select(doc_id.alias("doc_id"), spans.alias("spans"))


def synth_docs_sql(n_docs: int, violations: bool = True) -> str:
    """DuckDB SQL that rebuilds :func:`synth_docs` byte-identically —
    used as the correctness oracle for the flagship validation queries."""
    v = "TRUE" if violations else "FALSE"
    return f"""
WITH base AS (
  SELECT range AS i FROM range(0, {n_docs})
), flags AS (
  SELECT i,
    ({v} AND i % 101 = 0 AND i <> 0) AS v1,
    ({v} AND i % 113 = 0 AND i <> 0) AS v2,
    ({v} AND i % 103 = 0 AND i <> 0) AS v3,
    ({v} AND i % 211 = 0 AND i <> 0) AS v3b,
    ({v} AND i % 107 = 0 AND i <> 0) AS v4,
    ({v} AND i % 127 = 0 AND i <> 0) AS v5,
    ({v} AND i % 109 = 0 AND i <> 0) AS v7
  FROM base
)
SELECT
  CASE WHEN v5 THEN '{HOT_DOC_ID}' ELSE 'doc-' || lpad(CAST(i AS VARCHAR), 12, '0') END AS doc_id,
  CASE WHEN v7 THEN []::STRUCT(kind VARCHAR, text VARCHAR, media_ref VARCHAR, "offset" INTEGER)[]
  ELSE list_transform(range(0, CAST(i % 8 + 1 AS INTEGER)), j -> {{
    'kind': CASE WHEN v2 AND j = 0 THEN 'text'
                 WHEN v1 AND j = 0 THEN 'figure'
                 ELSE ['text','image','audio','video','table'][CAST((i + 2*j) % 5 AS INTEGER) + 1] END,
    'text': CASE WHEN v2 AND j = 0 THEN NULL
                 WHEN (CASE WHEN v2 AND j = 0 THEN 'text' WHEN v1 AND j = 0 THEN 'figure'
                       ELSE ['text','image','audio','video','table'][CAST((i + 2*j) % 5 AS INTEGER) + 1] END) = 'text'
                 THEN printf('txt-%d-%d snippet', i, j) ELSE NULL END,
    'media_ref': CASE WHEN v3 AND j = 1 THEN 'Xmedia://deadbeef/123'
                      WHEN v3b AND j = 2 THEN 'media://deadbeef/12345'
                      WHEN (CASE WHEN v2 AND j = 0 THEN 'text' WHEN v1 AND j = 0 THEN 'figure'
                            ELSE ['text','image','audio','video','table'][CAST((i + 2*j) % 5 AS INTEGER) + 1] END) <> 'text'
                      THEN printf('media://%08x/%d', (i * 97 + j) % 4294967296, (i + j) % 9999 + 1)
                      ELSE NULL END,
    'offset': CASE WHEN v4 AND j = 0 THEN -1 ELSE CAST(j * (i % 17 + 1) AS INTEGER) END
  }})
  END AS spans
FROM flags
"""


def synth_media_catalog(spark: SparkSession, n_docs: int) -> DataFrame:
    """Reference table for the referential check: every media_ref used by
    docs EXCEPT those of docs with ``i % 131 == 0`` (the v6 violations)."""
    docs = synth_docs(spark, n_docs)
    refs = (
        docs.withColumn("i", F.regexp_extract("doc_id", r"doc-(\d{12})", 1).cast("long"))
        .filter(~((F.col("i") % 131 == 0) & (F.col("i") != 0)))
        .select(F.explode("spans").alias("s"))
        .select(F.col("s.media_ref").alias("media_ref"))
        .filter(F.col("media_ref").isNotNull() & F.col("media_ref").rlike(r"^media://[a-z0-9]{8}/[0-9]{1,4}$"))
        .distinct()
    )
    return refs.withColumn("media_kind", F.lit("blob")).withColumn(
        "bytes", F.length("media_ref").cast("long") * 1024
    )

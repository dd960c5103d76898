"""Deterministic typed-matrix table exercising EVERY M2 validator family.

The reference's flagship "complex validator"
(``/root/reference/valideer/tests/test_validators.py:33-45``) exercises
Mapping, HeterogeneousSequence, AnyOf/AllOf/ChainOf, Nullable defaults,
AdaptTo coercion, String bounds and scalar types in one schema; this module
is its engine-level twin over a TYPED Spark table so the driver's DuckDB
gate can assert per-row verdicts and first-violation messages.

Generation is pure Column arithmetic over ``spark.range(n)`` — the same
seedless-deterministic style as :mod:`.docs` — and
:func:`typed_rows_sql` rebuilds the scalar+nested columns byte-identically
in DuckDB.

Violation design: row ``i`` carries AT MOST ONE injected violation,
selected by ``i % 101`` (residues 1..15, so ~15% of rows are invalid and
residue 0 keeps ``i == 0`` clean). Every injected bad value is a CONSTANT,
so the expected first-violation (path, constraint, message) per class is a
constant string the oracle can emit from the recomputed per-row class.

| class | column    | validator              | injected value        |
|-------|-----------|------------------------|-----------------------|
| 1     | name      | String(min_length=3)   | "ab"                  |
| 2     | name      | String(max_length=12)  | "abcdefghijklm"       |
| 3     | age       | Range(integer, >=0)    | -5                    |
| 4     | age       | Range(integer, <=150)  | 200                   |
| 5     | status    | Enum                   | "deleted"             |
| 6     | email     | Pattern                | "bad-email"           |
| 7     | flag      | required boolean       | NULL (missing)        |
| 8     | tags      | Mapping value Range    | {"neg": -3}           |
| 9     | pair      | HeterogeneousSequence  | (label "L0", weight 0)|
| 10    | codes     | HomogeneousSequence el | ["x-abc"]             |
| 11    | codes     | min_length=1           | []                    |
| 12    | raw_num   | ChainOf(AdaptTo(int))  | "abc" (not adaptable) |
| 13    | raw_num   | ChainOf Range          | "-7" (adapts, <0)     |
| 14    | maybe_num | AnyOf(Pattern, Enum)   | "??" (fails both)     |
| 15    | level     | AllOf(int, Range 1..5) | 9                     |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import core as V

STATUSES = ["active", "inactive", "banned"]

EMAIL_PATTERN = r"[a-z][a-z0-9]*@[a-z]+\.[a-z]{2,3}$"
CODE_PATTERN = r"c-\d{3}$"
NUM_PATTERN = r"\d+$"


def typed_schema() -> V.Validator:
    """One schema touching every §2.1–2.4 validator family the engine
    lowers natively (Time has no Spark column type; see kernel tests)."""
    return V.parse(
        {
            "+rec_id": "string",
            "+name": V.String(min_length=3, max_length=12),
            "+age": V.Range("integer", min_value=0, max_value=150),
            "+status": V.Enum(STATUSES),
            "+email": V.Pattern(EMAIL_PATTERN),
            "+flag": "boolean",
            "+born": "date",
            "+when_t": "datetime",
            "+ratio": "number",
            "?nick": V.Nullable("string", default="anon"),
            "+tags": V.Mapping("string", V.Range("integer", min_value=0)),
            "+pair": V.HeterogeneousSequence(
                "string", V.Range("integer", min_value=1)
            ),
            "+codes": V.HomogeneousSequence(
                V.Pattern(CODE_PATTERN), min_length=1
            ),
            "+raw_num": V.ChainOf(
                V.AdaptTo(int), V.Range("integer", min_value=0)
            ),
            "+maybe_num": V.AnyOf(V.Pattern(NUM_PATTERN), V.Enum(["N/A"])),
            "+level": V.AllOf("integer", V.Range("integer", min_value=1, max_value=5)),
        }
    )


def typed_rows(spark: SparkSession, n_rows: int) -> DataFrame:
    """Build the typed table (deterministic, distributed, no RNG)."""
    df = spark.range(n_rows).withColumnRenamed("id", "i")
    i = F.col("i")
    cls = i % 101

    def inj(c: int):
        return cls == c

    name = F.format_string("nm-%03d", i % 1000)
    name = F.when(inj(1), F.lit("ab")).otherwise(name)
    name = F.when(inj(2), F.lit("abcdefghijklm")).otherwise(name)

    age = (i % 120).cast("int")
    age = F.when(inj(3), F.lit(-5)).when(inj(4), F.lit(200)).otherwise(age)

    statuses = F.array(*[F.lit(s) for s in STATUSES])
    status = F.element_at(statuses, (i % 3 + 1).cast("int"))
    status = F.when(inj(5), F.lit("deleted")).otherwise(status)

    email = F.format_string("u%d@example.com", i % 50)
    email = F.when(inj(6), F.lit("bad-email")).otherwise(email)

    flag = F.when(inj(7), F.lit(None).cast("boolean")).otherwise(i % 2 == 0)

    born = F.date_add(F.lit("2000-01-01").cast("date"), (i % 9999).cast("int"))
    when_t = F.timestamp_seconds(946684800 + i * 61)
    ratio = (i % 97).cast("double") / F.lit(97.0)

    nick = F.when(i % 7 == 0, F.lit(None).cast("string")).otherwise(
        F.format_string("nick%d", i % 97)
    )

    tags = F.when(
        inj(8), F.create_map(F.lit("neg"), F.lit(-3).cast("long"))
    ).otherwise(
        F.create_map(
            F.lit("k1"), (i % 10).cast("long"), F.lit("k2"), (i % 5 + 1).cast("long")
        )
    )

    pair = F.when(
        inj(9),
        F.struct(F.lit("L0").alias("label"), F.lit(0).cast("int").alias("weight")),
    ).otherwise(
        F.struct(
            F.format_string("L%d", i % 9).alias("label"),
            (i % 9 + 1).cast("int").alias("weight"),
        )
    )

    codes = F.transform(
        F.sequence(F.lit(0), (i % 3).cast("int")),
        lambda j: F.format_string("c-%03d", F.pmod(i + j, F.lit(1000))),
    )
    codes = (
        F.when(inj(10), F.array(F.lit("x-abc")))
        .when(inj(11), F.array().cast("array<string>"))
        .otherwise(codes)
    )

    raw_num = F.format_string("%d", i % 500)
    raw_num = F.when(inj(12), F.lit("abc")).when(inj(13), F.lit("-7")).otherwise(raw_num)

    maybe_num = F.when(i % 2 == 0, F.format_string("%d", i % 333)).otherwise(
        F.lit("N/A")
    )
    maybe_num = F.when(inj(14), F.lit("??")).otherwise(maybe_num)

    level = (i % 5 + 1).cast("int")
    level = F.when(inj(15), F.lit(9)).otherwise(level)

    return df.select(
        F.format_string("rec-%08d", i).alias("rec_id"),
        name.alias("name"),
        age.alias("age"),
        status.alias("status"),
        email.alias("email"),
        flag.alias("flag"),
        born.alias("born"),
        when_t.alias("when_t"),
        ratio.alias("ratio"),
        nick.alias("nick"),
        tags.alias("tags"),
        pair.alias("pair"),
        codes.alias("codes"),
        raw_num.alias("raw_num"),
        maybe_num.alias("maybe_num"),
        level.alias("level"),
    )


def typed_rows_sql(n_rows: int) -> str:
    """DuckDB SQL rebuilding :func:`typed_rows` (scalar + nested columns).

    The nested columns (tags/pair/codes) are rebuilt too so the oracle can
    recompute validity from VALUES, not just from the class residue."""
    return f"""
SELECT
  i,
  i % 101 AS cls,
  format('rec-{{:08d}}', i) AS rec_id,
  CASE WHEN i % 101 = 1 THEN 'ab'
       WHEN i % 101 = 2 THEN 'abcdefghijklm'
       ELSE format('nm-{{:03d}}', i % 1000) END AS name,
  CASE WHEN i % 101 = 3 THEN -5
       WHEN i % 101 = 4 THEN 200
       ELSE i % 120 END AS age,
  CASE WHEN i % 101 = 5 THEN 'deleted'
       ELSE ['active','inactive','banned'][CAST(i % 3 + 1 AS INT)] END AS status,
  CASE WHEN i % 101 = 6 THEN 'bad-email'
       ELSE format('u{{}}@example.com', i % 50) END AS email,
  CASE WHEN i % 101 = 7 THEN NULL ELSE i % 2 = 0 END AS flag,
  DATE '2000-01-01' + CAST(i % 9999 AS INT) AS born,
  epoch_ms((946684800 + i * 61) * 1000) AS when_t,
  CAST(i % 97 AS DOUBLE) / 97.0 AS ratio,
  CASE WHEN i % 7 = 0 THEN NULL ELSE format('nick{{}}', i % 97) END AS nick,
  CASE WHEN i % 101 = 8 THEN MAP {{'neg': -3}}
       ELSE MAP {{'k1': i % 10, 'k2': i % 5 + 1}} END AS tags,
  CASE WHEN i % 101 = 9 THEN {{'label': 'L0', 'weight': 0}}
       ELSE {{'label': format('L{{}}', i % 9), 'weight': i % 9 + 1}} END AS pair,
  CASE WHEN i % 101 = 10 THEN ['x-abc']
       WHEN i % 101 = 11 THEN CAST([] AS VARCHAR[])
       ELSE list_transform(range(0, i % 3 + 1),
                           j -> format('c-{{:03d}}', (i + j) % 1000)) END AS codes,
  CASE WHEN i % 101 = 12 THEN 'abc'
       WHEN i % 101 = 13 THEN '-7'
       ELSE format('{{}}', i % 500) END AS raw_num,
  CASE WHEN i % 101 = 14 THEN '??'
       WHEN i % 2 = 0 THEN format('{{}}', i % 333)
       ELSE 'N/A' END AS maybe_num,
  CASE WHEN i % 101 = 15 THEN 9 ELSE i % 5 + 1 END AS level
FROM range({n_rows}) t(i)
"""

"""M2 exit criterion: the reference suite's "complex validator" (one schema
exercising nearly every operator) runs on a DataFrame and agrees with the
kernel row-for-row — verdicts and first-violation messages."""

import datetime
import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import valideer_spark as V
from valideer_spark.core.errors import ValidationError
from valideer_spark.plans import lower


def complex_schema():
    return V.parse({
        "+n": "number",
        "?i": V.Nullable("integer", 0),
        "?b": bool,
        "?e": V.Enum(["r", "g", "b"]),
        "?s": V.String(min_length=1, max_length=8),
        "?p": V.Nullable(re.compile(r"\d{1,4}$")),
        "?l": [{"+s2": "string"}],
        "?t": ("string", "number"),
        "?h": V.Mapping("integer", ["string"]),
        "?o": V.NonNullable({"+i2": "integer"}),
    })


DTYPE = T.StructType([
    T.StructField("n", T.DoubleType()),
    T.StructField("i", T.LongType()),
    T.StructField("b", T.BooleanType()),
    T.StructField("e", T.StringType()),
    T.StructField("s", T.StringType()),
    T.StructField("p", T.StringType()),
    T.StructField("l", T.ArrayType(T.StructType([T.StructField("s2", T.StringType())]))),
    T.StructField("t", T.StructType([T.StructField("_1", T.StringType()),
                                     T.StructField("_2", T.DoubleType())])),
    T.StructField("h", T.MapType(T.LongType(), T.ArrayType(T.StringType()))),
    T.StructField("o", T.StructType([T.StructField("i2", T.LongType())])),
])

ROWS = [
    {"n": 2.0},
    {"n": 2.1, "i": 3},
    {"n": -1.0, "b": False},
    {"n": 3.0, "e": "r"},
    {"n": 0.0, "s": "abc"},
    {"n": 0.0, "p": None},
    {"n": 0.0, "p": "123"},
    {"n": 0.0, "l": []},
    {"n": 0.0, "l": [{"s2": "foo"}, {"s2": ""}]},
    {"n": 0.0, "t": {"_1": "joe", "_2": 3.1}},
    {"n": 0.0, "h": {5: ["foo", "bar"], 0: []}},
    {"n": 0.0, "o": {"i2": 3}},
    # invalid cases
    {},
    {"n": 1.0, "e": "a"},
    {"n": 1.0, "s": ""},
    {"n": 1.0, "s": "123456789"},
    {"n": 1.0, "p": "123a"},
    {"n": 1.0, "l": [{"s2": None}]},
    {"n": 1.0, "t": {"_1": None, "_2": 3.1}},
    {"n": 1.0, "h": {5: ["foo", None], 0: []}},
    {"n": 1.0, "o": {"i2": None}},
    # NB: {"o": None} is VALID — NULL field ≡ absent property, and "?o" is
    # optional; the engine cannot express valideer's "present-as-None vs
    # absent" distinction on a struct column (documented convention).
    {"n": 1.0, "o": None},
]


def to_kernel_value(row):
    """Struct row → the python document the kernel validates (NULL field ≡
    absent; positional struct ≡ tuple)."""
    doc = {}
    for k, v in row.asDict(recursive=True).items():
        if v is None:
            continue
        if k == "l":
            doc[k] = [{kk: vv for kk, vv in item.items() if vv is not None}
                      for item in v]
        elif k == "t":
            doc[k] = (v["_1"], v["_2"])
        elif k == "o":
            doc[k] = {kk: vv for kk, vv in v.items() if vv is not None}
        elif k == "h":
            doc[k] = {kk: list(vv) for kk, vv in v.items()}
        else:
            doc[k] = v
    return doc


def test_complex_validator_on_dataframe(spark):
    schema = complex_schema()
    node = lower(schema, DTYPE)
    df = spark.createDataFrame(
        [(r,) for r in ROWS], T.StructType([T.StructField("x", DTYPE)])
    )
    out = df.select(
        F.col("x"),
        node.predicate(F.col("x")).alias("ok"),
        node.violations(F.col("x"), F.lit("")).alias("vio"),
    ).collect()

    n_invalid = 0
    for row in out:
        doc = to_kernel_value(row.x)
        kernel_ok = schema.is_valid(doc)
        assert row.ok == kernel_ok, f"verdict mismatch for {doc!r}"
        if not kernel_ok:
            n_invalid += 1
            with pytest.raises(ValidationError) as exc_info:
                schema.validate(doc, adapt=False)
            kernel_msg = exc_info.value.to_string()
            v = row.vio[0]
            spark_msg = v["message"] + (
                " (at %s)" % v["path"] if v["path"] else ""
            )
            assert spark_msg == kernel_msg, f"for {doc!r}"
    assert n_invalid == 9


def test_complex_adaptation_on_dataframe(spark):
    """Nullable-default fill ('i' → 0) flows through struct adaptation."""
    schema = complex_schema()
    node = lower(schema, DTYPE)
    df = spark.createDataFrame(
        [({"n": 2.0},)], T.StructType([T.StructField("x", DTYPE)])
    )
    adapted = df.select(node.adapt(F.col("x")).alias("a")).collect()[0].a
    assert adapted.i == 0  # kernel: Nullable("integer", 0) default fill
    kernel_out = schema.validate({"n": 2.0})
    assert kernel_out["i"] == 0

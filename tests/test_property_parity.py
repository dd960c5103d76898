"""Property-based Spark/kernel agreement: hypothesis-generated values
through representative lowered schemas, verdicts + adapted values must
match the kernel exactly. One Spark job per schema (all generated values
batched into a single DataFrame) keeps this fast."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

import valideer_spark as V
from valideer_spark.plans import lower

SCHEMAS = [
    ("string_bounds", V.String(min_length=2, max_length=10), T.StringType()),
    ("pattern", V.Pattern(r"[a-z]{1,3}\d*$"), T.StringType()),
    ("enum", V.Enum(["a", "b", "c"]), T.StringType()),
    ("range", V.Range("integer", -5, 5), T.LongType()),
    ("nullable_default", V.Nullable("integer", 7), T.LongType()),
    ("anyof", V.AnyOf(V.Enum(["x"]), V.Pattern(r"y+$")), T.StringType()),
    ("adapt_int", V.AdaptTo(int, traps=(ValueError, TypeError)), T.StringType()),
    (
        "seq",
        V.HomogeneousSequence("integer", min_length=1, max_length=4),
        T.ArrayType(T.LongType()),
    ),
]

STRATEGIES = {
    T.StringType().simpleString(): st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=12,
        ),
    ),
    T.LongType().simpleString(): st.one_of(
        st.none(), st.integers(min_value=-(2**31), max_value=2**31)
    ),
    T.ArrayType(T.LongType()).simpleString(): st.one_of(
        st.none(),
        st.lists(
            st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
            max_size=5,
        ),
    ),
}


@pytest.mark.parametrize("name,validator,dtype", SCHEMAS, ids=[s[0] for s in SCHEMAS])
def test_property_parity(spark, name, validator, dtype):
    strategy = STRATEGIES[dtype.simpleString()]
    samples = []

    @settings(max_examples=60, deadline=None, database=None)
    @given(strategy)
    def collect(value):
        samples.append(value)

    collect()
    node = lower(validator, dtype)
    df = spark.createDataFrame(
        [(v,) for v in samples], T.StructType([T.StructField("x", dtype)])
    )
    rows = df.select(
        F.col("x"),
        node.predicate(F.col("x")).alias("ok"),
        node.adapt(F.col("x")).alias("adapted"),
    ).collect()
    for row, value in zip(rows, samples):
        expected = validator.is_valid(value)
        assert row.ok == expected, f"{name}: verdict mismatch for {value!r}"
        if expected:
            kernel_adapted = validator.validate(value, adapt=True)
            assert row.adapted == kernel_adapted, (
                f"{name}: adapt mismatch for {value!r}"
            )

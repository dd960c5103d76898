"""HeterogeneousSequence with MIXED per-position out-types lowers fully
natively — no Python eval nodes in predicate or adapt plans (VERDICT r2
item 4; reference semantics validators.py:519-558, the flagship tuple
"pair" cases of the reference suite).

Two physical forms:

* ARRAY form (array<string> column): positions adapting to different
  types render adapted elements as strings (a Spark array has ONE
  element type); validation/violations stay per-position native.
* STRUCT form (positional struct column): adapted field types are kept
  exactly (struct fields are independently typed) — the typed path.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import valideer_spark.core as V
from valideer_spark.plans.lowering import lower


def _plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_array_form_mixed_adapt_native(spark):
    # position 0 adapts str -> int, position 1 stays string: mixed out-type
    v = V.parse((V.ChainOf(V.AdaptTo(int), V.Range("integer", min_value=0)),
                 V.String(min_length=1)))
    node = lower(v, T.ArrayType(T.StringType()))

    df = spark.createDataFrame(
        [(["7", "ok"],), (["-3", "ok"],), (["x", "ok"],), (["5", ""],), (None,)],
        T.StructType([T.StructField("t", T.ArrayType(T.StringType()))]),
    )
    out = df.select(
        node.predicate(F.col("t")).alias("ok"),
        node.adapt(F.col("t")).alias("a"),
    )
    plan = _plan_of(out)
    assert "EvalPython" not in plan and "BatchEvalPython" not in plan

    rows = out.collect()
    assert [r["ok"] for r in rows] == [True, False, False, False, False]
    # mixed out-types render as strings in the array form
    assert rows[0]["a"] == ["7", "ok"]
    # kernel agreement on accept/reject
    kernel = V.parse((V.ChainOf(V.AdaptTo(int), V.Range("integer", min_value=0)),
                      V.String(min_length=1)))
    assert kernel.is_valid(["7", "ok"]) and not kernel.is_valid(["-3", "ok"])
    assert kernel.validate(["7", "ok"]) == [7, "ok"]


def test_struct_form_mixed_adapt_keeps_types(spark):
    v = V.parse((V.ChainOf(V.AdaptTo(int), V.Range("integer", min_value=0)),
                 V.String(min_length=1)))
    dtype = T.StructType(
        [T.StructField("_0", T.StringType()), T.StructField("_1", T.StringType())]
    )
    node = lower(v, dtype)
    # adapted struct keeps EXACT per-position types: long + string
    assert isinstance(node.out_type, T.StructType)
    assert isinstance(node.out_type.fields[0].dataType, T.LongType)
    assert isinstance(node.out_type.fields[1].dataType, T.StringType)

    df = spark.createDataFrame(
        [(("7", "ok"),), (("x", "ok"),), (("7", ""),)],
        T.StructType([T.StructField("t", dtype)]),
    )
    out = df.select(
        node.predicate(F.col("t")).alias("ok"),
        node.adapt(F.col("t")).alias("a"),
    )
    plan = _plan_of(out)
    assert "EvalPython" not in plan and "BatchEvalPython" not in plan

    rows = out.collect()
    assert [r["ok"] for r in rows] == [True, False, False]
    assert rows[0]["a"]["_0"] == 7 and rows[0]["a"]["_1"] == "ok"


def test_reference_pair_case(spark):
    """The reference suite's '?t': (unicode, 'number') pair — string +
    numeric positions over a positional struct."""
    v = V.parse(("string", "number"))
    dtype = T.StructType(
        [T.StructField("_0", T.StringType()), T.StructField("_1", T.DoubleType())]
    )
    node = lower(v, dtype)
    df = spark.createDataFrame(
        [(("a", 1.5),), ((None, 1.5),), (("a", None),)],
        T.StructType([T.StructField("t", dtype)]),
    )
    rows = df.select(node.predicate(F.col("t")).alias("ok")).collect()
    # NULL field == absent position -> arity/type violation per engine
    # convention (kernel: ("a", 1.5) valid; missing element invalid)
    assert [r["ok"] for r in rows] == [True, False, False]
    kernel = V.parse(("string", "number"))
    assert kernel.is_valid(("a", 1.5))
    assert not kernel.is_valid(("a",))

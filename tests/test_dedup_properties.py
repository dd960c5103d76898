"""Property-based checks of the dedup algebra (hypothesis): the Spark
operators must agree with a brute-force Python oracle on arbitrary small
corpora — complements the fixed-corpus DuckDB gates."""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far", "big", "sun"]


def _norm_tokens(text):
    return re.sub(r"\s+", " ", text).strip().lower().split(" ")


def _shingles(text, n=3):
    t = _norm_tokens(text)
    return {" ".join(t[i : i + n]) for i in range(max(0, len(t) - n + 1))}


docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=8).map(" ".join),
    min_size=2,
    max_size=8,
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=docs_strategy)
def test_jaccard_pairs_match_bruteforce(spark, texts):
    from valideer_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["a_id"], r["b_id"])
        for r in ngram_jaccard_pairs(
            df, threshold_num=1, threshold_den=2
        ).collect()
    }
    expected = set()
    sh = {i: _shingles(t) for i, t in enumerate(texts)}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if inter * 2 >= union:
                expected.add((a, b))
    assert got == expected


@pytest.mark.usefixtures("spark")
@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=docs_strategy)
def test_minhash_candidates_cover_identical_sets(spark, texts):
    """Guaranteed-recall property: docs with IDENTICAL shingle sets must
    always appear as MinHash LSH candidates (identical signatures agree
    on every band)."""
    from valideer_spark.operators.dedup import minhash_lsh_candidates

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    cands = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_candidates(df).collect()
    }
    sh = {i: _shingles(t) for i, t in enumerate(texts)}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if sh[a] and sh[a] == sh[b]:
                assert (a, b) in cands

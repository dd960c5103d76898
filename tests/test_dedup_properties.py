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


def test_lsh_max_bucket_star_links_hot_clusters(spark):
    """max_bucket skew guard: buckets wider than the cap switch from
    all-pairs to star linking (min id -> member), bounding per-bucket
    join input while keeping the duplicate cluster one connected
    component; buckets within the cap are byte-identical to the
    uncapped run."""
    from pyspark.sql import functions as F

    from valideer_spark.operators.dedup import minhash_lsh_candidates

    # 30 identical-text docs (the hot cluster) + two normal near-dup pairs
    hot = [(1000 + j, "aa bb cc dd ee ff gg hh") for j in range(30)]
    normal = [
        (1, "the cat sat on the mat today ok"),
        (2, "the cat sat on the mat today yes"),
        (3, "apples bananas cherries dates elderberry figs grapes"),
        (4, "apples bananas cherries dates elderberry figs melons"),
    ]
    df = spark.createDataFrame(hot + normal, ["doc_id", "text"])

    uncapped = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_candidates(df).collect()
    }
    capped_rows = minhash_lsh_candidates(df, max_bucket=10).collect()
    capped = {(r["a_id"], r["b_id"]) for r in capped_rows}

    hot_ids = {h[0] for h in hot}
    star = {(1000, 1000 + j) for j in range(1, 30)}
    # hot cluster: exactly the 29 star edges, not the 435 all-pairs
    assert {p for p in capped if p[0] in hot_ids} == star
    assert len({p for p in uncapped if p[0] in hot_ids}) == 435
    # non-hot candidates unharmed: identical pair sets outside the cluster
    assert {p for p in capped if p[0] not in hot_ids} == {
        p for p in uncapped if p[0] not in hot_ids
    }
    # star edges hit every band (identical signatures)
    star_hits = {r["n_bands_hit"] for r in capped_rows if r["a_id"] in hot_ids}
    assert star_hits == {16}


@pytest.mark.usefixtures("spark")
def test_verify_prune_output_identical(spark):
    """prune=True is a plan-only lever: the verified pair set (and every
    score column) must match prune=False exactly, including candidates
    whose ids carry no shingles (dropped by the size filter either way)."""
    from valideer_spark.operators.dedup import (
        jaccard_verify_candidates,
        minhash_lsh_candidates,
    )

    docs = [
        (1, "the cat sat on the mat today ok"),
        (2, "the cat sat on the mat today yes"),
        (3, "apples bananas cherries dates elderberry figs grapes"),
        (4, "apples bananas cherries dates elderberry figs melons"),
        (5, "dog ran far big sun the cat sat"),
        (6, "zz"),  # too short for 3-shingles: no row in the shingle frame
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    cand = minhash_lsh_candidates(df).select("a_id", "b_id").union(
        spark.createDataFrame([(5, 6)], ["a_id", "b_id"])  # shingle-less id
    )

    def rows(prune):
        return sorted(
            tuple(r) for r in jaccard_verify_candidates(
                df, cand, threshold_num=1, threshold_den=2, prune=prune
            ).collect()
        )

    plain, pruned = rows(False), rows(True)
    assert plain == pruned
    assert plain  # non-degenerate: at least one verified pair

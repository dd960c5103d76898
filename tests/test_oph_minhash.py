"""One-Permutation Hashing MinHash (densified) — structural and recall
properties. OPH is the long-document scale path for signatures (O(n)
in doc length vs O(n*k)); banding downstream is unchanged, so these
tests pin exactly what banding needs: determinism, densified slots,
slot-agreement tracking Jaccard, and end-to-end candidate recall via
``minhash_lsh_candidates(method='oph')``.
"""

import pytest
from pyspark.sql import functions as F

from valideer_spark.operators.dedup import (
    _OPH_MASK,
    jaccard_verify_candidates,
    minhash_lsh_candidates,
    minhash_signatures_oph,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = ["tok%d" % i for i in range(400)]


def test_oph_identical_sets_identical_signatures(spark):
    text = " ".join(WORDS)
    df = _frame(spark, [(1, text), (2, text), (3, " ".join(reversed(WORDS)))])
    sigs = {
        r["id"]: tuple(r["signature"])
        for r in minhash_signatures_oph(df, num_hashes=64).collect()
    }
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    assert len(sigs[1]) == 64
    # densification leaves no sentinel slots: every slot carries a real
    # (borrowed or owned) 48-bit value
    assert all((v & _OPH_MASK) != _OPH_MASK for v in sigs[1])


def test_oph_short_doc_densifies(spark):
    # 3 tokens -> 1 shingle hash -> 63 of 64 bins empty; rotation
    # densification must still fill every slot deterministically
    df = _frame(spark, [(1, "a b c"), (2, "a b c")])
    rows = minhash_signatures_oph(df, num_hashes=64).collect()
    assert tuple(rows[0]["signature"]) == tuple(rows[1]["signature"])
    assert len(set(rows[0]["signature"])) == 1  # all borrowed from the one slot


def test_oph_slot_agreement_tracks_jaccard(spark):
    # doc B shares 300 of 400 tokens with A -> shingle Jaccard ~0.6;
    # E[slot agreement] ~= J for densified OPH. Deterministic corpus, so
    # wide bounds make this a stable structural check, not a flake.
    a = " ".join(WORDS)
    b = " ".join(WORDS[:300] + ["z%d" % i for i in range(100)])
    c = " ".join("zz%d" % i for i in range(400))
    df = _frame(spark, [(1, a), (2, b), (3, c)])
    sigs = {
        r["id"]: list(r["signature"])
        for r in minhash_signatures_oph(df, num_hashes=128).collect()
    }
    agree = lambda x, y: sum(p == q for p, q in zip(sigs[x], sigs[y])) / 128.0
    assert 0.35 < agree(1, 2) < 0.85  # J(a,b) ~ 0.55-0.65
    assert agree(1, 3) < 0.05  # disjoint docs


def test_oph_lsh_candidates_end_to_end(spark):
    # 40 base docs + 10 exact dups + 5 near-dups (75% token overlap):
    # method='oph' must recover every seeded pair through banding AND
    # exact-Jaccard verification, same contract as the universal path
    base = {
        i: " ".join("w%d_%d" % (i, j) for j in range(120)) for i in range(40)
    }
    rows = [(i, t) for i, t in base.items()]
    rows += [(1000 + i, base[i]) for i in range(10)]  # exact dups
    for i in range(5):
        toks = base[i].split()
        rows.append((2000 + i, " ".join(toks[:90] + ["n%d_%d" % (i, j) for j in range(30)])))
    df = _frame(spark, rows)
    cand = minhash_lsh_candidates(
        df, num_hashes=64, bands=32, method="oph"
    )
    verified = jaccard_verify_candidates(
        df, cand, threshold_num=1, threshold_den=2
    )
    got = {(r["a_id"], r["b_id"]) for r in verified.collect()}
    for i in range(10):
        assert (i, 1000 + i) in got  # exact dups: structural recall
    for i in range(5):
        assert (i, 2000 + i) in got  # ~0.57-Jaccard near-dups
    # no spurious pairs among unrelated base docs
    assert not any(a < 40 and b < 40 for a, b in got)


def test_oph_method_validation(spark):
    df = _frame(spark, [(1, "a b c d e")])
    with pytest.raises(ValueError, match="method"):
        minhash_lsh_candidates(df, method="nope")

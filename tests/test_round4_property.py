"""Property tests for the round-4 operators: invariants that must
hold for ARBITRARY documents, checked against independent pure-Python
statements of the math. One Spark job per example batch (hypothesis
draws a list of docs; the batch runs as one DataFrame)."""

import math
from collections import Counter

from hypothesis import given, settings, strategies as st

from etl_portfolio_tracker_spark import schemas
from etl_portfolio_tracker_spark.operators import packing as PK
from etl_portfolio_tracker_spark.operators import text as TX

WORDS = st.sampled_from(["a", "bb", "ccc", "dd", "e", "zz"])
DOC = st.lists(WORDS, min_size=1, max_size=40).map(" ".join)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", f"s{i % 2}", len(t)) for i, t in enumerate(texts)],
        schema=schemas.DOCUMENTS)


@settings(max_examples=10, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=8))
def test_word_entropy_matches_independent_formula(spark, texts):
    out = {r["doc_id"]: r for r in
           TX.word_entropy(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        c = Counter(t.split(" "))
        n = sum(c.values())
        expect = -sum((v / n) * math.log(v / n) for v in c.values())
        r = out[i]
        assert r["n_tokens"] == n and r["n_distinct"] == len(c)
        # the operator emits round-6 values → half-ulp-of-6dp bound;
        # and entropy must sit in [0, ln(n_distinct)]
        assert abs(r["entropy"] - expect) <= 5.0000001e-7
        assert -1e-12 <= r["entropy"] <= math.log(len(c)) + 5e-7


@settings(max_examples=10, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=8))
def test_doc_chunks_partition_properties(spark, texts):
    rows = PK.doc_chunks(_docs(spark, texts)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        n = len(t.split(" "))
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        # starts advance by exactly the stride; every token covered;
        # no chunk exceeds the window
        starts = [c["chunk_start"] for c in chunks]
        assert starts == list(range(1, n + 1, PK.CHUNK_STRIDE))
        covered = set()
        for c in chunks:
            assert 1 <= c["n_chunk_tokens"] <= PK.CHUNK_WINDOW
            covered.update(range(c["chunk_start"],
                                 c["chunk_start"] + c["n_chunk_tokens"]))
        assert covered == set(range(1, n + 1))


@settings(max_examples=8, deadline=None)
@given(st.lists(DOC, min_size=4, max_size=24), st.integers(2, 5))
def test_stratified_kfold_balance_property(spark, texts, k):
    rows = PK.stratified_kfold(_docs(spark, texts), k=k).collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append(r["fold"])
    for src, folds in per.items():
        n = len(folds)
        c = Counter(folds)
        # round-robin deal: fold sizes differ by at most 1 and the
        # first n % k folds (by id) carry the extra document
        assert max(c.values()) - min(c.values()) <= 1
        assert sum(c.values()) == n
        assert set(c) <= set(range(k))

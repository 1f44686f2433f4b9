"""Semantic pins for the round-6 analytics ops (cross-engine
exactness is tools/check.py's job; these pin the math on constructed
frames where the answer is hand-derivable)."""

import math

import pytest

from etl_portfolio_tracker_spark.operators import packing as PK
from etl_portfolio_tracker_spark.operators import text as TX


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_source_ols_fit_exact_line(spark):
    # y = 10x + 2 exactly: "tok" repeated x times with single spaces →
    # n_chars = 4x - 1... construct texts whose (x, y) sit on a line.
    # x tokens of 9 chars + separators: y = 10x - 1 → slope 10,
    # intercept -1, r2 = 1.
    rows = [(i, " ".join(["abcdefghi"] * x), "s0")
            for i, x in enumerate([2, 5, 9])]
    out = TX.source_ols_fit(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 3
    assert r["slope"] == pytest.approx(10.0)
    assert r["intercept"] == pytest.approx(-1.0)
    assert r["r2"] == pytest.approx(1.0)


def test_source_ols_fit_degenerate_source_nulls(spark):
    # var(x) = 0 (all docs same token count) → null fit, not ±inf
    rows = [(1, "a b c", "s0"), (2, "d e f", "s0"), (3, "gg hh ii", "s0")]
    r = TX.source_ols_fit(_docs(spark, rows)).collect()[0]
    assert r["slope"] is None and r["intercept"] is None and r["r2"] is None


def test_source_temperature_mix_sqrt_weights(spark):
    # two sources, 100 and 400 tokens: sqrt weights 10/30 and 20/30;
    # the small source is upsampled (boost 5/3), the big one down (5/6)
    rows = ([(i, " ".join(["t"] * 10), "small") for i in range(10)]
            + [(100 + i, " ".join(["t"] * 20), "big") for i in range(20)])
    out = {r["source"]: r for r in
           PK.source_temperature_mix(_docs(spark, rows),
                                     budget=3000).collect()}
    assert out["small"]["n_tokens"] == 100
    assert out["big"]["n_tokens"] == 400
    assert out["small"]["temp_weight"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["big"]["temp_weight"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["small"]["expected_tokens"] == pytest.approx(1000.0, abs=0.01)
    assert out["small"]["boost"] == pytest.approx(5 / 3, abs=1e-6)
    assert out["big"]["boost"] == pytest.approx(5 / 6, abs=1e-6)
    # weights always sum to 1
    assert sum(r["temp_weight"] for r in out.values()) == pytest.approx(1.0, abs=1e-5)


def test_source_temperature_mix_flattens_shares(spark, sf_dir):
    # on the real corpus: boost > 1 iff the source is smaller than the
    # (weighted) average — temperature flattens the distribution
    from etl_portfolio_tracker_spark.io import read_table
    out = PK.source_temperature_mix(
        read_table(spark, sf_dir, "documents")).collect()
    assert sum(r["temp_weight"] for r in out) == pytest.approx(1.0, abs=1e-4)
    # order by size: boosts must be non-increasing in n_tokens
    by_size = sorted(out, key=lambda r: r["n_tokens"])
    boosts = [r["boost"] for r in by_size]
    assert all(b1 >= b2 - 1e-9 for b1, b2 in zip(boosts, boosts[1:]))


# --- ewma_prices -----------------------------------------------------------

def _prices_frame(spark, rows):
    return spark.createDataFrame(rows, "ticker string, ts date, close double")


def test_ewma_hand_derived_with_key_reset(spark):
    import datetime as dt
    d = dt.date
    rows = [("A", d(2024, 1, 1), 100.0),
            ("A", d(2024, 1, 2), 104.0),
            ("A", d(2024, 1, 3), 108.0),
            ("B", d(2024, 1, 1), 50.0),
            ("B", d(2024, 1, 2), 10.0)]
    from etl_portfolio_tracker_spark.operators import windowed as WD
    out = {(r["ticker"], r["ts"]): r["ewma"]
           for r in WD.ewma_prices(_prices_frame(spark, rows)).collect()}
    # A: 100; .25*104+.75*100 = 101; .25*108+.75*101 = 102.75
    assert out[("A", d(2024, 1, 1))] == 100.0
    assert out[("A", d(2024, 1, 2))] == 101.0
    assert out[("A", d(2024, 1, 3))] == 102.75
    # B resets: 50; .25*10+.75*50 = 40
    assert out[("B", d(2024, 1, 1))] == 50.0
    assert out[("B", d(2024, 1, 2))] == 40.0


def test_ewma_matches_pandas_ewm_bitwise(spark, sf_dir):
    # pandas ewm(adjust=False) runs the identical recursion
    # s_t = (1-a)*s_{t-1} + a*x_t; both multiplies and the add are
    # single correctly-rounded IEEE ops, so the series must be
    # BIT-identical before the display rounding.
    # (numpy's .round is banker's; Spark/DuckDB round HALF_UP on the
    # exact decimal expansion of the double — mirror that here, e.g.
    # 7.7765625 is exactly representable and the conventions split)
    from decimal import ROUND_HALF_UP, Decimal
    from etl_portfolio_tracker_spark import derive
    from etl_portfolio_tracker_spark.operators import windowed as WD

    # repr(x), not Decimal(x): Spark's round(double) goes through
    # BigDecimal.valueOf = Double.toString = the SHORTEST round-trip
    # decimal, so 7.77656249999… (exact bits) rounds as "7.7765625"
    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"),
                                               ROUND_HALF_UP))

    px = derive.tick_prices(spark, sf_dir)
    got = (WD.ewma_prices(px).orderBy("ticker", "ts")
           .toPandas())
    ref = (px.orderBy("ticker", "ts").toPandas()
           .assign(ewma=lambda d: d.groupby("ticker")["close"]
                   .transform(lambda s: s.ewm(alpha=0.25,
                                              adjust=False).mean())
                   .map(r6)))
    assert list(got["ewma"]) == list(ref["ewma"])


def test_ewma_state_carries_across_arrow_batches(spark):
    # force 2-row Arrow batches so one ticker's series spans several
    # mapInPandas batches — the kernel must carry state across them
    import datetime as dt
    from etl_portfolio_tracker_spark.operators import windowed as WD
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "2")
    try:
        rows = [("A", dt.date(2024, 1, 1 + i), 100.0 + 4 * i)
                for i in range(7)]
        out = [r["ewma"] for r in
               (WD.ewma_prices(_prices_frame(spark, rows))
                .orderBy("ts").collect())]
        s, exp = None, []
        for c in [100.0 + 4 * i for i in range(7)]:
            s = c if s is None else 0.25 * c + 0.75 * s
            exp.append(round(s, 6))
        assert out == exp
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


# --- prefix_filter_pairs ---------------------------------------------------

def test_prefix_filter_equals_bruteforce_verifier(spark, sf_dir):
    # same shingle width and threshold → prefix filtering must return
    # EXACTLY the brute-force all-shared-shingle verifier's pairs
    # (zero false negatives is the AllPairs theorem; zero false
    # positives because both run the same exact verify)
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.operators import dedup as DD
    docs = read_table(spark, sf_dir, "documents")
    got = {(r["doc_a"], r["doc_b"], r["n_common"], r["jaccard"])
           for r in DD.prefix_filter_pairs(docs, k=DD.SHINGLE_K).collect()}
    ref = {(r["doc_a"], r["doc_b"], r["n_common"], r["jaccard"])
           for r in DD.ngram_jaccard_pairs(docs, threshold=0.7).collect()}
    assert got == ref
    assert len(got) > 0  # the corpus plants near-dups — non-vacuous


def test_prefix_filter_boundary_inclusive(spark):
    # k=1 shingles = distinct chars. A={a..i} (9), B={a..g,x} (8):
    # common 7 → J = 7/10 = 0.7 exactly: included (>=).
    # B,C={a..f,x,y}: common {a..f,x} = 7, union 9 → 7/9: included.
    # A,C: common 6, union 11 → 6/11 < 0.7: excluded.
    from etl_portfolio_tracker_spark.operators import dedup as DD
    docs = spark.createDataFrame(
        [(1, "abcdefghi"), (2, "abcdefgx"), (3, "abcdefxy")],
        "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in DD.prefix_filter_pairs(docs, k=1).collect()}
    assert set(out) == {(1, 2), (2, 3)}
    assert out[(1, 2)] == 0.7
    assert out[(2, 3)] == 7 / 9


def test_prefix_filter_candidates_shrink(spark, sf_dir):
    # the point of the prefix rule: candidate pairs are a small
    # fraction of the all-shared-shingle pair space at the same k
    from pyspark.sql import Window as W, functions as F
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.operators import dedup as DD
    docs = read_table(spark, sf_dir, "documents")
    sh = DD.shingles(docs, k=DD.PF_SHINGLE_K)
    all_pairs = (sh.alias("a").join(sh.alias("b"), "shingle")
                 .filter(F.col("a.doc_id") < F.col("b.doc_id"))
                 .select(F.col("a.doc_id"), F.col("b.doc_id"))
                 .distinct().count())
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    wdoc = W.partitionBy("doc_id")
    ranked = (sh.join(dfreq, "shingle")
              .withColumn("_n", F.count(F.lit(1)).over(wdoc))
              .withColumn("_rn", F.row_number().over(
                  wdoc.orderBy("_df", "shingle"))))
    pref = (ranked.filter(
        F.col("_rn") <= F.col("_n") - F.expr("(7*_n+9) div 10") + 1)
        .select("doc_id", "shingle"))
    pf_pairs = (pref.alias("a").join(pref.alias("b"), "shingle")
                .filter(F.col("a.doc_id") < F.col("b.doc_id"))
                .select(F.col("a.doc_id"), F.col("b.doc_id"))
                .distinct().count())
    assert pf_pairs < all_pairs / 2

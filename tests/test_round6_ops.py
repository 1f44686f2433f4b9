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


# --- evaluation tier (score_auc / pr_curve / score_ks) ----------------------

def _eval_docs(spark):
    # en-marker score = hits of {the,and,of,to,a}; gold = lang=='en'
    # pos scores [2, 1], neg scores [0, 1]
    rows = [(1, "the and", "en"), (2, "the x", "en"),
            (3, "x y", "de"), (4, "of q", "de")]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_score_auc_hand_derived(spark):
    # pairwise: (2>0)=1, (2>1)=1, (1>0)=1, (1==1)=0.5 → 3.5/4
    from etl_portfolio_tracker_spark.operators import evaluation as EV
    r = EV.score_auc(_eval_docs(spark)).collect()[0]
    assert r["auc"] == 3.5 / 4
    assert r["n_pos"] == 2 and r["n_neg"] == 2


def test_score_auc_equals_pairwise_on_corpus(spark, sf_dir):
    # midrank identity == brute-force pairwise count on the real docs
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.operators import evaluation as EV
    docs = read_table(spark, sf_dir, "documents")
    r = EV.score_auc(docs).collect()[0]
    g = EV._score_groups(docs, "en").toPandas()
    wins = ties = 0
    for _, a in g.iterrows():
        for _, b in g.iterrows():
            npos, nneg = a["p"], b["n"] - b["p"]
            if a["score"] > b["score"]:
                wins += npos * nneg
            elif a["score"] == b["score"]:
                ties += npos * nneg
    P = int(g["p"].sum())
    N = int((g["n"] - g["p"]).sum())
    assert r["auc"] == (wins + 0.5 * ties) / (P * N)
    # the synthetic corpus draws words from one shared pool, so the
    # marker score carries little signal — AUC near 0.5 is the honest
    # reading, and the operator reports it rather than promising lift
    assert 0.0 < r["auc"] < 1.0


def test_pr_curve_hand_derived(spark):
    from etl_portfolio_tracker_spark.operators import evaluation as EV
    out = {r["threshold"]: r for r in EV.pr_curve(_eval_docs(spark)).collect()}
    assert out[2]["tp"] == 1 and out[2]["fp"] == 0
    assert out[2]["precision"] == 1.0 and out[2]["recall"] == 0.5
    assert out[1]["tp"] == 2 and out[1]["fp"] == 1
    assert out[1]["precision"] == 2 / 3 and out[1]["recall"] == 1.0
    assert out[0]["precision"] == 0.5 and out[0]["recall"] == 1.0


def test_score_ks_hand_derived(spark):
    # cdf_pos = [0, .5, 1], cdf_neg = [.5, 1, 1] at scores 0,1,2 →
    # |diff| = .5, .5, 0: KS = .5 at the LOWEST tied threshold (0)
    from etl_portfolio_tracker_spark.operators import evaluation as EV
    r = EV.score_ks(_eval_docs(spark)).collect()[0]
    assert r["ks"] == 0.5
    assert r["at_threshold"] == 0


def test_chi2_hand_derived_2x2(spark):
    # 2x2 shortcut: chi2 = n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    # cells en/s0=10, en/s1=20, de/s0=30, de/s1=40 → n=100,
    # chi2 = 100*(10*40-20*30)^2 / (30*70*40*60) = 0.793650…
    import math
    from etl_portfolio_tracker_spark.operators import evaluation as EV
    rows = ([(i, "x", "en", "s0") for i in range(10)]
            + [(100 + i, "x", "en", "s1") for i in range(20)]
            + [(200 + i, "x", "de", "s0") for i in range(30)]
            + [(300 + i, "x", "de", "s1") for i in range(40)])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    r = EV.chi2_lang_source(docs).collect()[0]
    exp = 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
    assert r["chi2"] == pytest.approx(exp, abs=1e-6)
    assert r["dof"] == 1
    assert r["cramers_v"] == pytest.approx(math.sqrt(exp / 100), abs=1e-6)
    assert r["n_docs"] == 100


def test_waiting_suppliers_matches_pandas_recompute(spark, sf_dir):
    # third independent formulation (pandas row scan) of the Q21
    # analog: late rows of the sole late supplier in >=2-supplier
    # orders — must agree with the one-join-one-aggregate rewrite
    import pandas as pd
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.operators import warehouse as WH
    got = [(r["s_name"], r["numwait"])
           for r in WH.waiting_suppliers(spark, sf_dir).collect()]
    li = read_table(spark, sf_dir, "lineitem").toPandas()
    orders = read_table(spark, sf_dir, "orders").toPandas()
    supp = read_table(spark, sf_dir, "supplier").toPandas()
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j["late"] = j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=60)
    wait: dict = {}
    for _, grp in j.groupby("l_orderkey"):
        ns = grp["l_suppkey"].nunique()
        late_supps = grp.loc[grp["late"], "l_suppkey"]
        if ns >= 2 and late_supps.nunique() == 1:
            sk = late_supps.iloc[0]
            wait[sk] = wait.get(sk, 0) + int(grp["late"].sum())
    names = dict(zip(supp["s_suppkey"], supp["s_name"]))
    exp = sorted(((names[sk], n) for sk, n in wait.items()),
                 key=lambda t: (-t[1], t[0]))[:20]
    assert got == exp
    assert len(got) > 0


def test_logit_fit_learns_separable_signal(spark):
    # y=1 docs are stopword-dense, y=0 docs stopword-free → the fit
    # must find a positive slope and beat the chance loss ln(2)
    import math
    rows = ([(i, "the of to and in is the of", "en") for i in range(20)]
            + [(100 + i, "qq ww ee rr tt yy uu oo", "de") for i in range(20)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = TX.logit_quality_fit(docs).collect()[0]
    assert r["n_docs"] == 40
    assert r["w1"] > 0
    assert r["mean_log_loss"] < math.log(2)


def test_logit_fit_matches_python_irls_bitwise(spark, sf_dir):
    # pure-Python replication of the exact contract: per-row terms
    # quantized to DECIMAL(38,10) with Spark's double->decimal cast
    # semantics (HALF_UP on the shortest repr — BigDecimal.valueOf),
    # decimal sums, IEEE Newton algebra. Must agree bit-for-bit.
    import math
    from decimal import ROUND_HALF_UP, Decimal
    from etl_portfolio_tracker_spark.io import read_table

    def q10(v):
        return Decimal(repr(v)).quantize(Decimal("1e-10"), ROUND_HALF_UP)

    docs = read_table(spark, sf_dir, "documents").toPandas()
    xs, ys = [], []
    import re
    for _, row in docs.iterrows():
        toks = re.sub(r"\s+", " ", row["text"].strip().lower()).split(" ")
        n_stop = sum(t in TX.STOPWORDS for t in toks)
        xs.append(n_stop / len(toks) if len(toks) > 0 else 0.0)
        ys.append(1.0 if row["lang"] == "en" else 0.0)
    w0 = w1 = 0.0
    for _ in range(TX.LOGIT_ITERS):
        g0 = g1 = h00 = h01 = h11 = Decimal(0)
        for x, y in zip(xs, ys):
            mu = 1.0 / (1.0 + math.exp(-(w0 + w1 * x)))
            s = mu * (1.0 - mu)
            g0 += q10(y - mu)
            g1 += q10(x * (y - mu))
            h00 += q10(s)
            h01 += q10(x * s)
            h11 += q10(x * x * s)
        g0f, g1f = float(g0), float(g1)
        h00f, h01f, h11f = float(h00), float(h01), float(h11)
        det = h00f * h11f - h01f * h01f
        w0 = w0 + (h11f * g0f - h01f * g1f) / det
        w1 = w1 + (h00f * g1f - h01f * g0f) / det
    lls = Decimal(0)
    for x, y in zip(xs, ys):
        mu = 1.0 / (1.0 + math.exp(-(w0 + w1 * x)))
        lls += q10(-(y * math.log(mu) + (1.0 - y) * math.log(1.0 - mu)))
    from decimal import Decimal as D

    def r6(v):
        return float(D(repr(v)).quantize(D("1e-6"), ROUND_HALF_UP))

    got = TX.logit_quality_fit(
        read_table(spark, sf_dir, "documents")).collect()[0]
    assert got["w0"] == r6(w0)
    assert got["w1"] == r6(w1)
    assert got["mean_log_loss"] == r6(float(lls) / len(xs))
    assert got["n_docs"] == len(xs)


# --- prefix filter property test --------------------------------------------

def test_prefix_filter_property_random_corpora(spark):
    # AllPairs completeness + exactness on arbitrary small corpora:
    # prefix-filtered pairs == pure-Python brute force over distinct
    # k-shingle sets, for several thresholds and shingle widths
    from hypothesis import given, settings, strategies as st
    from etl_portfolio_tracker_spark.operators import dedup as DD

    WORDS = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
    DOC = st.lists(WORDS, min_size=1, max_size=12).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(DOC, min_size=2, max_size=7),
           st.sampled_from([(1, 2), (7, 10), (9, 10)]),
           st.sampled_from([1, 3, 5]))
    def run(texts, tau, k):
        tau_num, tau_den = tau
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string")
        got = {(r["doc_a"], r["doc_b"], r["n_common"])
               for r in DD.prefix_filter_pairs(
                   docs, tau_num=tau_num, tau_den=tau_den, k=k).collect()}
        sets = {i: {t[j:j + k] for j in range(len(t) - k + 1)}
                for i, t in enumerate(texts)}
        exp = set()
        for a in sets:
            for b in sets:
                if a < b and sets[a] and sets[b]:
                    inter = len(sets[a] & sets[b])
                    union = len(sets[a] | sets[b])
                    if inter / union >= tau_num / tau_den:
                        exp.add((a, b, inter))
        assert got == exp

    run()


def test_streaming_ewma_matches_pandas_recursion(spark, sf_dir):
    # the keyed streaming state's final value must equal the literal
    # per-ticker recursion over (ts, event_id)-ordered event values
    from decimal import ROUND_HALF_UP, Decimal
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.streaming.replay import (
        streaming_ewma_replay)

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"),
                                               ROUND_HALF_UP))

    got = {r["ticker"]: (r["n_events"], r["ewma"])
           for r in streaming_ewma_replay(spark, sf_dir).collect()}
    ev = (read_table(spark, sf_dir, "events")
          .select("event_type", "ts", "event_id", "value").toPandas()
          .sort_values(["event_type", "ts", "event_id"]))
    exp = {}
    for t, grp in ev.groupby("event_type"):
        s, n = 0.0, 0
        for v in grp["value"].values:
            v = float(v)
            s = v if n == 0 else 0.25 * v + 0.75 * s
            n += 1
        exp[t] = (n, r6(s))
    assert got == exp


def test_pr_auc_hand_derived(spark):
    # thresholds desc: t=2 ΔR=.5 P=1; t=1 ΔR=.5 P=2/3; t=0 ΔR=0 →
    # AP = .5*1 + .5*2/3 = 5/6
    from etl_portfolio_tracker_spark.operators import evaluation as EV
    r = EV.pr_auc(_eval_docs(spark)).collect()[0]
    assert r["n_pos"] == 2 and r["n_neg"] == 2
    assert abs(r["avg_precision"] - 5 / 6) < 5.1e-7  # round-6 display


def test_evaluation_tier_property_random_corpora(spark):
    # AUC (pairwise), KS (cdf max), AP (step sum) on arbitrary
    # score/label distributions vs pure-Python brute force — scores
    # are en-marker counts, so texts are built from markers + noise
    from hypothesis import given, settings, strategies as st
    from etl_portfolio_tracker_spark.operators import evaluation as EV

    MARKERS = ["the", "and", "of", "to", "a"]
    DOC = st.tuples(st.integers(0, 4), st.sampled_from(["en", "de"]))

    @settings(max_examples=8, deadline=None)
    @given(st.lists(DOC, min_size=2, max_size=12).filter(
        lambda xs: any(l == "en" for _, l in xs)
        and any(l != "en" for _, l in xs)))
    def run(items):
        rows = [(i, " ".join(MARKERS[:s] or ["zz"]), lang)
                for i, (s, lang) in enumerate(items)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string")
        scores = [(s, 1 if lang == "en" else 0) for s, lang in items]
        P = sum(y for _, y in scores)
        N = len(scores) - P
        # AUC brute force
        wins = ties = 0
        for sa, ya in scores:
            for sb, yb in scores:
                if ya == 1 and yb == 0:
                    wins += sa > sb
                    ties += sa == sb
        r = EV.score_auc(docs).collect()[0]
        assert r["auc"] == (wins + 0.5 * ties) / (P * N)
        # KS brute force (max over thresholds, lowest tied threshold)
        best, at = -1, None
        for t in sorted({s for s, _ in scores}):
            cp = sum(1 for s, y in scores if y == 1 and s <= t)
            cn = sum(1 for s, y in scores if y == 0 and s <= t)
            num = abs(cp * N - cn * P)
            if num > best:
                best, at = num, t
        k = EV.score_ks(docs).collect()[0]
        assert k["ks"] == best / (P * N)
        assert k["at_threshold"] == at
        # AP brute force over descending distinct thresholds
        ap = 0.0
        for t in sorted({s for s, _ in scores}, reverse=True):
            p_t = sum(1 for s, y in scores if y == 1 and s == t)
            tp = sum(1 for s, y in scores if y == 1 and s >= t)
            fp = sum(1 for s, y in scores if y == 0 and s >= t)
            ap += (p_t / P) * (tp / (tp + fp))
        a = EV.pr_auc(docs).collect()[0]
        assert abs(a["avg_precision"] - ap) < 5.1e-7  # round-6 display
    run()

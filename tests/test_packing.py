"""Unit tests for packing.pack_sequences / chunk_dedup semantics."""

import pytest

from etl_portfolio_tracker_spark.operators import packing as PK


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_pack_sequences_lays_docs_head_to_tail(spark):
    texts = ["a " * 100, "b " * 60, "c " * 50]   # 100, 60, 50 tokens
    out = (PK.pack_sequences(_docs(spark, texts), budget=128, n_bins=1)
           .orderBy("doc_id").toPandas().set_index("doc_id"))
    # order within the bin: by n_tokens desc -> doc0(100), doc1(60), doc2(50)
    # stream offsets: 0, 100, 160 -> seqs 0, 0, 1; offsets 0, 100, 32
    assert list(out["n_tokens"]) == [100, 60, 50]
    assert list(out["seq"]) == [0, 0, 1]
    assert list(out["offset"]) == [0, 100, 32]


def test_pack_sequences_respects_bins(spark):
    texts = ["x " * 10] * 8
    out = PK.pack_sequences(_docs(spark, texts), budget=64, n_bins=4) \
            .toPandas()
    assert set(out["bin"]) == {0, 1, 2, 3}
    assert (out["bin"] == out["doc_id"] % 4).all()


def test_chunk_dedup_drops_repeats_keeps_first(spark):
    # doc0 and doc1 share an identical 4-token chunk; doc0 wins
    texts = ["one two three four five six seven eight",
             "one two three four nine ten eleven twelve"]
    out = (PK.chunk_dedup(_docs(spark, texts), chunk_tokens=4)
           .orderBy("doc_id").toPandas().set_index("doc_id"))
    assert out.loc[0, "n_chunks"] == 2 and out.loc[0, "n_kept"] == 2
    assert out.loc[1, "n_chunks"] == 2 and out.loc[1, "n_kept"] == 1
    # kept_chars counts only surviving chunk text
    assert out.loc[1, "kept_chars"] == len("nine ten eleven twelve")


def test_chunk_dedup_identical_docs_collapse(spark):
    texts = ["same words in every doc here now ok"] * 3
    out = PK.chunk_dedup(_docs(spark, texts), chunk_tokens=4).toPandas()
    assert out["n_kept"].sum() == out[out.doc_id == 0]["n_chunks"].iloc[0]


def test_pack_total_tokens_conserved(spark):
    texts = ["w " * n for n in (5, 17, 90, 33, 260, 7)]
    df = PK.pack_sequences(_docs(spark, texts), budget=64, n_bins=2)
    got = df.groupBy().sum("n_tokens").first()[0]
    assert got == 5 + 17 + 90 + 33 + 260 + 7


def test_bigram_lm_score_hand_computed(spark):
    import math
    from etl_portfolio_tracker_spark.operators import text as TX
    # corpus: "a b a b" and "a c" ->
    # bigrams: (a,b)x2, (b,a)x1, (a,c)x1 ; c1: a=3, b=1 ; V=2
    out = (TX.bigram_lm_score(_docs(spark, ["a b a b", "a c"]))
           .orderBy("doc_id").toPandas().set_index("doc_id"))
    p_ab = math.log((2 + 1) / (3 + 2))
    p_ba = math.log((1 + 1) / (1 + 2))
    p_ac = math.log((1 + 1) / (3 + 2))
    assert out.loc[0, "n_bigrams"] == 3
    assert out.loc[0, "avg_logprob"] == pytest.approx(
        (2 * p_ab + p_ba) / 3, abs=1e-6)
    assert out.loc[1, "n_bigrams"] == 1
    assert out.loc[1, "avg_logprob"] == pytest.approx(p_ac, abs=1e-6)


def test_epoch_shuffle_is_permutation_and_deterministic(spark):
    texts = ["w"] * 50
    a = PK.epoch_shuffle(_docs(spark, texts), n_buckets=4).toPandas()
    b = PK.epoch_shuffle(_docs(spark, texts), n_buckets=4).toPandas()
    # every doc exactly once; positions are 0..count-1 within a bucket
    assert sorted(a["doc_id"]) == list(range(50))
    for _, grp in a.groupby("bucket"):
        assert sorted(grp["pos"]) == list(range(len(grp)))
    # deterministic across runs (no rand())
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True))
    # different seed -> different permutation (overwhelmingly)
    c = PK.epoch_shuffle(_docs(spark, texts), seed=18, n_buckets=4).toPandas()
    assert not a.sort_values("doc_id").reset_index(drop=True).equals(
        c.sort_values("doc_id").reset_index(drop=True))


def test_token_budget_mix_cuts_at_budget(spark):
    # source col required: build frame directly
    rows = [(0, "a " * 10, "s1"), (1, "b " * 8, "s1"), (2, "c " * 5, "s1"),
            (3, "d " * 3, "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = (PK.token_budget_mix(df, budget=18)
           .toPandas().set_index("source"))
    # s1 ranked 10, 8, 5: cum 10, 18, 23 -> keep first two (cum<=18)
    assert out.loc["s1", "n_docs"] == 3
    assert out.loc["s1", "n_kept"] == 2
    assert out.loc["s1", "kept_tokens"] == 18
    assert out.loc["s2", "n_kept"] == 1 and out.loc["s2", "kept_tokens"] == 3


def test_token_budget_mix_scalable_equals_simple(spark):
    import random
    rng = random.Random(11)
    # skewed: source s0 holds 80% of docs
    rows = []
    for i in range(400):
        src = "s0" if i < 320 else f"s{1 + i % 3}"
        rows.append((i, "w " * rng.randint(1, 40), src))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = (PK.token_budget_mix(df, budget=500)
         .toPandas().reset_index(drop=True))
    b = (PK.token_budget_mix_scalable(df, budget=500, n_parts=7)
         .toPandas().reset_index(drop=True))
    assert a.equals(b)


def test_token_budget_mix_scalable_matches_on_harness_data(spark):
    from etl_portfolio_tracker_spark.io import read_table
    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    a = PK.token_budget_mix(docs).toPandas().reset_index(drop=True)
    b = PK.token_budget_mix_scalable(docs).toPandas().reset_index(drop=True)
    assert a.equals(b)


def test_epoch_shuffle_bijection_on_sparse_ids(spark):
    # non-contiguous / large doc_ids must still yield a permutation
    ids = [3, 99, 10**12, 7_777_777, 42, 1]
    df = spark.createDataFrame([(i, "t") for i in ids],
                               "doc_id long, text string")
    out = PK.epoch_shuffle(df, n_buckets=3).toPandas()
    assert sorted(out["doc_id"]) == sorted(ids)
    for _, g in out.groupby("bucket"):
        assert sorted(g["pos"]) == list(range(len(g)))


def test_pps_sample_picks_sum_to_k_and_weight_heavy_docs(spark):
    from etl_portfolio_tracker_spark.operators import packing as PK
    # doc 1 holds ~80% of the tokens -> gets ~80% of the picks; total
    # multiplicity is exactly k.
    rows = [(0, "w " * 10, "en", "s", 20),
            (1, "w " * 80, "en", "s", 160),
            (2, "w " * 10, "en", "s", 20)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = {r["doc_id"]: r for r in PK.pps_sample(d, k=10).collect()}
    assert sum(r["n_picks"] for r in out.values()) == 10
    assert out[1]["n_picks"] == 8
    assert out[0]["n_picks"] >= 1 and out[2]["n_picks"] >= 1
    # intervals tile the number line
    assert out[0]["cum_start"] == 0
    assert out[1]["cum_start"] == out[0]["n_tokens"]


def test_ranged_cumsum_matches_single_window(spark):
    from pyspark.sql import Window as W, functions as F
    from etl_portfolio_tracker_spark.operators.packing import ranged_cumsum
    rows = [(i, (7 * i + 3) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r["k"]: r["_cum"]
           for r in ranged_cumsum(df, "v", ["k"], n_parts=8).collect()}
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, 0)
    want = {r["k"]: r["c"]
            for r in df.select("k", F.sum("v").over(w).alias("c")).collect()}
    assert got == want


def test_pps_sample_has_no_partitionless_window(spark, sf_dir):
    # the global prefix sum must be the two-pass ranged form — a
    # WindowExec with an empty partition spec serializes the corpus
    # through one task (the ADVICE r2 finding this guards against)
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.operators.packing import pps_sample
    docs = read_table(spark, sf_dir, "documents")
    plan = pps_sample(docs)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line:
            # window specs print as [sum(...) windowspecdefinition(part, ord, ...)]
            # a partitionless global window prints no partition expressions
            # before the ordering spec; the only windows allowed here are
            # keyed by _pid or ordered over the O(parts) offsets frame
            assert "_pid" in line or "_ptot" in line or "w#" in line, line

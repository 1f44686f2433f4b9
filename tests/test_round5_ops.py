"""Round-5 operators on constructed micro-frames: winnowing
fingerprints, char entropy, readability, unigram perplexity,
normalized dedup, hapax ratio, balanced downsampling, event paths,
interval joins, Sharpe, hard-negative mining, SQ8 quantization, PCA
power iteration, plus warehouse stats invariants at sf0.001."""

import datetime as dt
import math

from pyspark.sql import functions as F

from etl_portfolio_tracker_spark import schemas
from etl_portfolio_tracker_spark.operators import finance as FIN
from etl_portfolio_tracker_spark.operators import sessions as SE
from etl_portfolio_tracker_spark.operators import similarity as SIM
from etl_portfolio_tracker_spark.operators import text as TX
from etl_portfolio_tracker_spark.operators import warehouse as WH


def docs_df(spark, texts, sources=None, langs=None):
    srcs = sources or ["src"] * len(texts)
    lgs = langs or ["en"] * len(texts)
    return spark.createDataFrame(
        [(i, t, lg, s, len(t))
         for i, (t, s, lg) in enumerate(zip(texts, srcs, lgs))],
        schema=schemas.DOCUMENTS)


def emb_df(spark, vecs, labels=None):
    lbs = labels or [0] * len(vecs)
    return spark.createDataFrame(
        [(i, [float(x) for x in v], int(lb))
         for i, (v, lb) in enumerate(zip(vecs, lbs))],
        schema=schemas.EMBEDDINGS)


def events_df(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    return spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for (i, ts, u, et, v) in rows],
        schema="event_id long, ts timestamp_ntz, user_id long, "
               "event_type string, value double, props string")


# -- winnowing_fingerprints -------------------------------------------

def test_winnowing_short_doc_empty(spark):
    # fewer than k words → no grams → no fingerprints
    assert TX.winnowing_fingerprints(docs_df(spark, ["a b"])).count() == 0


def test_winnowing_degenerate_window_global_min(spark):
    # k=3 words per gram, 4 words → 2 grams < w → ONE fingerprint,
    # the global minimum gram
    out = TX.winnowing_fingerprints(docs_df(spark, ["a b c d"])).collect()
    assert len(out) == 1
    assert out[0]["pos"] in (1, 2)


def test_winnowing_shared_run_guarantee(spark):
    # the winnowing guarantee: any shared run of w+k-1 (=6) words
    # yields at least one shared fingerprint
    shared = "zeta eta theta iota kappa lambda"
    out = TX.winnowing_fingerprints(docs_df(spark, [
        "alpha beta " + shared + " gamma",
        shared + " mu nu xi omicron"]))
    a = {r["fp"] for r in out.collect() if r["doc_id"] == 0}
    b = {r["fp"] for r in out.collect() if r["doc_id"] == 1}
    assert a & b


def test_winnowing_selects_window_minima(spark):
    # every selected fingerprint must BE the min of the w-window
    # starting at some position (validated densely for one doc)
    text = "one two three four five six seven eight nine ten"
    toks = text.split()
    k, w = TX.WINNOW_K, TX.WINNOW_W
    import hashlib
    grams = [hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
             for i in range(len(toks) - k + 1)]
    keys = [g + str(TX._WINNOW_POS_BASE - (i + 1)).zfill(10)
            for i, g in enumerate(grams)]
    expect = {min(keys[i:i + w]) for i in range(len(keys) - w + 1)}
    expect = {(TX._WINNOW_POS_BASE - int(kk[32:]), kk[:32]) for kk in expect}
    out = {(r["pos"], r["fp"]) for r in
           TX.winnowing_fingerprints(docs_df(spark, [text])).collect()}
    assert out == expect


# -- char_entropy ------------------------------------------------------

def test_char_entropy_degenerate(spark):
    out = TX.char_entropy(docs_df(spark, ["aaaa"])).collect()[0]
    assert out["n_chars"] == 4 and out["n_distinct_chars"] == 1
    assert out["char_entropy"] == 0.0


def test_char_entropy_uniform(spark):
    out = TX.char_entropy(docs_df(spark, ["ab"])).collect()[0]
    assert out["char_entropy"] == round(math.log(2), 6)


# -- readability_scores ------------------------------------------------

def test_readability_known_value(spark):
    # "the cat sat." → 3 words, 1 sentence, 3 syllables (1 vowel
    # group each) → flesch = 206.835 - 1.015*3 - 84.6*1
    out = TX.readability_scores(docs_df(spark, ["the cat sat."])).collect()[0]
    assert out["n_words"] == 3
    assert out["n_sentences"] == 1
    assert out["n_syllables"] == 3
    assert out["flesch"] == round(206.835 - 1.015 * 3 - 84.6 * 1, 6)
    assert out["fk_grade"] == round(0.39 * 3 + 11.8 * 1 - 15.59, 6)


def test_readability_min_one_syllable_and_sentence(spark):
    # no vowels, no terminal punctuation → mins kick in
    out = TX.readability_scores(docs_df(spark, ["xyz zzz"])).collect()[0]
    assert out["n_sentences"] == 1 and out["n_syllables"] == 2


# -- unigram_perplexity ------------------------------------------------

def test_unigram_perplexity_hand_computed(spark):
    # corpus "a a b": N=3, V=2; p(a)=(2+1)/5, p(b)=(1+1)/5
    out = TX.unigram_perplexity(docs_df(spark, ["a a b"])).collect()[0]
    ll = 2 * math.log(3 / 5) + 1 * math.log(2 / 5)
    assert out["n_tokens"] == 3
    assert abs(out["perplexity"] - math.exp(-ll / 3)) < 1e-5


def test_unigram_perplexity_outlier_doc_scores_higher(spark):
    # a doc of corpus-rare words must be more perplexing than one of
    # corpus-common words
    out = {r["doc_id"]: r["perplexity"] for r in TX.unigram_perplexity(
        docs_df(spark, ["a a a a", "a a a a", "q r s t"])).collect()}
    assert out[2] > out[0]


# -- normalized_dedup --------------------------------------------------

def test_normalized_dedup_collision_and_keeper(spark):
    out = {r["doc_id"]: r for r in TX.normalized_dedup(docs_df(spark, [
        "Hello, World!", "hello world", "unrelated"])).collect()}
    assert out[0]["canon_hash"] == out[1]["canon_hash"]
    assert out[0]["group_size"] == 2 and out[2]["group_size"] == 1
    assert out[0]["keep"] and not out[1]["keep"] and out[2]["keep"]


# -- hapax_ratio -------------------------------------------------------

def test_hapax_ratio_hand_computed(spark):
    out = TX.hapax_ratio(docs_df(spark, ["a a b"])).collect()[0]
    assert out["n_tokens"] == 3 and out["vocab"] == 2
    assert out["n_hapax"] == 1
    assert out["ttr"] == round(2 / 3, 6)
    assert out["hapax_share"] == 0.5


# -- balanced_downsample ----------------------------------------------

def test_balanced_downsample_cuts_to_min_stratum(spark):
    docs = docs_df(spark, ["a", "b", "c", "d"],
                   sources=["s1", "s1", "s1", "s2"])
    out = TX.balanced_downsample(docs).collect()
    assert len(out) == 2                      # one per stratum
    assert {r["rank"] for r in out} == {1}
    assert {r["source"] for r in out} == {"s1", "s2"}


def test_balanced_downsample_deterministic(spark):
    docs = docs_df(spark, ["a", "b", "c", "d"],
                   sources=["s1", "s1", "s1", "s2"])
    a = sorted(r["doc_id"] for r in TX.balanced_downsample(docs).collect())
    b = sorted(r["doc_id"] for r in TX.balanced_downsample(docs).collect())
    assert a == b


# -- top_event_paths / interval_event_join ----------------------------

def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_top_event_paths_order_and_truncation(spark):
    ev = events_df(spark, [
        (0, _t(9), 1, "view", 1.0), (1, _t(10), 1, "click", 1.0),
        (2, _t(11), 1, "buy", 1.0), (3, _t(12), 1, "view", 1.0),
        (4, _t(9), 2, "view", 1.0), (5, _t(10), 2, "click", 1.0),
        (6, _t(11), 2, "buy", 1.0)])
    out = SE.top_event_paths(ev).collect()
    assert out[0]["path"] == "view>click>buy"   # 4th event truncated
    assert out[0]["n_user_days"] == 2


def test_interval_event_join_counts(spark):
    ev = events_df(spark, [
        (0, _t(10), 1, "view", 1.0), (1, _t(11), 1, "view", 1.0),
        (2, _t(10, 30), 2, "error", 1.0),       # inside user1 interval
        (3, _t(12), 3, "error", 1.0)])          # outside user1 interval
    out = {r["user_id"]: r for r in SE.interval_event_join(ev).collect()}
    assert out[1]["n_target_during"] == 1 and out[1]["n_own"] == 2
    # degenerate interval contains its own point event
    assert out[2]["n_target_during"] == 1
    assert out[3]["n_target_during"] == 1


# -- sharpe_rolling ----------------------------------------------------

def test_sharpe_rolling_null_when_flat(spark):
    # constant closes → zero returns → sd = 0 → sharpe NULL
    tp = spark.createDataFrame(
        [("A", dt.date(2024, 1, d), 10.0) for d in range(1, 5)],
        schema="ticker string, ts date, close double")
    out = FIN.sharpe_rolling(tp).collect()
    assert all(r["sharpe"] is None for r in out)


def test_sharpe_rolling_hand_computed(spark):
    tp = spark.createDataFrame(
        [("A", dt.date(2024, 1, 1), 10.0),
         ("A", dt.date(2024, 1, 2), 11.0),
         ("A", dt.date(2024, 1, 3), 10.0)],
        schema="ticker string, ts date, close double")
    rets = [0.0, 0.1, round(10.0 / 11.0 - 1, 10)]
    out = FIN.sharpe_rolling(tp).collect()
    r = [0.0, 0.1, 10.0 / 11.0 - 1.0]
    for i in (1, 2):
        window = r[:i + 1]
        m = sum(window) / len(window)
        var = (sum(x * x for x in window) - sum(window) ** 2 / len(window)) \
            / (len(window) - 1)
        sharpe = m / math.sqrt(var) * math.sqrt(252.0)
        assert abs(out[i]["sharpe"] - sharpe) < 1e-4


# -- hard_negative_mining ---------------------------------------------

def test_hard_negative_mining_picks_expected_pairs(spark):
    emb = emb_df(spark, [[1, 0], [1, 0], [0.6, 0.8], [0, 1]],
                 labels=[0, 1, 0, 1])
    out = {r["vec_id"]: r for r in SIM.hard_negative_mining(emb).collect()}
    # v0 (l0): hardest negative = identical v1 (cos 1); hardest
    # positive = v2 (cos 0.6)
    assert out[0]["hn_id"] == 1 and out[0]["hn_cos"] == 1.0
    assert out[0]["hp_id"] == 2 and abs(out[0]["hp_cos"] - 0.6) < 1e-6
    # v3 (l1): hardest positive = v1 (cos 0) — the lone same-label peer
    assert out[3]["hp_id"] == 1


def test_hard_negative_mining_singleton_label_nulls(spark):
    emb = emb_df(spark, [[1, 0], [0, 1]], labels=[0, 1])
    out = {r["vec_id"]: r for r in SIM.hard_negative_mining(emb).collect()}
    assert out[0]["hp_id"] is None and out[0]["hn_id"] == 1


# -- embedding_quantize_int8 ------------------------------------------

def test_quantize_endpoints_exact(spark):
    # range endpoints quantize losslessly
    out = SIM.embedding_quantize_int8(
        emb_df(spark, [[0.0], [255.0]])).collect()
    assert all(r["rmse"] == 0.0 and r["max_abs_err"] == 0.0 for r in out)


def test_quantize_constant_dim_zero_error(spark):
    # mn == mx → scale 0 path → error must be exactly 0, not NaN
    out = SIM.embedding_quantize_int8(
        emb_df(spark, [[5.0, 1.0], [5.0, 2.0]])).collect()
    assert all(math.isfinite(r["rmse"]) for r in out)


def test_quantize_midpoint_error(spark):
    # dim range [0,1]: x=0.5 → code round(127.5)=128 → err 0.5-128/255
    out = {r["vec_id"]: r for r in SIM.embedding_quantize_int8(
        emb_df(spark, [[0.0], [1.0], [0.5]])).collect()}
    expect = abs(0.5 - 128.0 * (1.0 / 255.0))
    assert abs(out[2]["max_abs_err"] - expect) < 1e-6   # output is round-6


# -- pca_power_iteration ----------------------------------------------

def test_pca_recovers_dominant_direction(spark):
    # points on the line span([1, 2]) → top component ∝ [1,2]/√5
    vecs = [[t, 2.0 * t] for t in (-2.0, -1.0, 0.0, 1.0, 2.0)]
    out = {r["pos"]: r for r in
           SIM.pca_power_iteration(emb_df(spark, vecs)).collect()}
    v = [out[1]["loading"], out[2]["loading"]]
    nrm = math.sqrt(v[0] ** 2 + v[1] ** 2)
    assert abs(nrm - 1.0) < 1e-5
    assert abs(abs(v[1] / v[0]) - 2.0) < 1e-4
    assert out[1]["mu"] == 0.0 and out[2]["mu"] == 0.0


def test_pca_mu_centering(spark):
    vecs = [[1.0, 10.0], [3.0, 10.0]]
    out = {r["pos"]: r for r in
           SIM.pca_power_iteration(emb_df(spark, vecs)).collect()}
    assert out[1]["mu"] == 2.0 and out[2]["mu"] == 10.0
    # all variance on dim 1 → loading = e1
    assert abs(abs(out[1]["loading"]) - 1.0) < 1e-6


# -- warehouse stats invariants at sf0.001 ----------------------------

def test_equi_depth_histogram_invariants(spark, sf_dir):
    from etl_portfolio_tracker_spark.io import read_table
    out = WH.equi_depth_histogram(spark, sf_dir).collect()
    total = read_table(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in out) == total
    # depths differ by at most 1; bucket ranges are ordered
    depths = [r["n_orders"] for r in out]
    assert max(depths) - min(depths) <= 1
    for a, b in zip(out, out[1:]):
        assert a["hi"] <= b["lo"]


def test_benford_fractions_sum_to_one(spark, sf_dir):
    out = WH.benford_first_digit(spark, sf_dir).collect()
    assert all(1 <= r["digit"] <= 9 for r in out)
    assert abs(sum(r["observed"] for r in out) - 1.0) < 1e-4
    assert abs(sum(r["benford"] for r in out) - 1.0) < 1e-4


def test_weighted_median_is_weighted(spark, sf_dir):
    from etl_portfolio_tracker_spark.io import read_table
    out = {r["l_returnflag"]: r
           for r in WH.weighted_median_price(spark, sf_dir).collect()}
    li = (read_table(spark, sf_dir, "lineitem")
          .select("l_returnflag", "l_extendedprice", "l_quantity").collect())
    import collections
    rows = collections.defaultdict(list)
    for r in li:
        rows[r["l_returnflag"]].append((r["l_extendedprice"], r["l_quantity"]))
    for flag, pairs in rows.items():
        pairs.sort()
        tot = sum(q for _, q in pairs)
        cum = 0.0
        for price, q in pairs:
            cum += q
            if 2 * cum >= tot:
                assert abs(out[flag]["weighted_median"] - price) < 1e-9
                break


def test_fk_orphans_clean_load(spark, sf_dir):
    out = WH.fk_orphans(spark, sf_dir).collect()
    assert len(out) == 4
    assert all(r["n_orphans"] == 0 for r in out)
    assert all(r["n_rows"] > 0 for r in out)


def test_fk_orphans_detects_breakage(spark, sf_dir):
    # sanity that the check CAN fire: an order key that exists in no
    # dimension must show up as an orphan when injected
    from etl_portfolio_tracker_spark.io import read_table
    li = read_table(spark, sf_dir, "lineitem")
    bogus = li.limit(1).withColumn("l_orderkey", F.lit(-999_999))
    n = (li.unionByName(bogus)
         .join(read_table(spark, sf_dir, "orders")
               .select(F.col("o_orderkey").alias("_k")).distinct(),
               F.col("l_orderkey") == F.col("_k"), "left_anti").count())
    assert n == 1


# -- streaming_quality_filter_replay ----------------------------------

def test_streaming_quality_filter_matches_batch(spark, sf_dir):
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.streaming.replay import (
        streaming_quality_filter_replay,
    )
    streamed = sorted(
        map(tuple, streaming_quality_filter_replay(spark, sf_dir).collect()))
    batch = sorted(
        map(tuple,
            TX.gopher_filter(read_table(spark, sf_dir, "documents"))
            .collect()))
    assert streamed == batch


# -- lang_id_confusion -------------------------------------------------

def test_lang_id_confusion_counts_and_shares(spark):
    docs = docs_df(spark, ["the cat and the dog", "der hund ist gut",
                           "qqq www"],
                   langs=["en", "de", "en"])
    out = {(r["lang"], r["lang_pred"]): r
           for r in TX.lang_id_confusion(docs).collect()}
    assert out[("en", "en")]["n"] == 1 and out[("en", "en")]["is_correct"]
    assert out[("en", "und")]["n"] == 1 and not out[("en", "und")]["is_correct"]
    assert out[("de", "de")]["n"] == 1
    assert out[("en", "en")]["share"] == 0.5


# -- ngram_novelty ----------------------------------------------------

def test_ngram_novelty_duplicate_doc_zero(spark):
    docs = docs_df(spark, ["a b c d e f", "a b c d e f", "p q r s t u"])
    out = {r["doc_id"]: r for r in TX.ngram_novelty(docs).collect()}
    # doc0 and doc1 share ALL grams; min doc_id wins novelty
    assert out[0]["novelty"] == 1.0 and out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 1.0
    assert out[0]["n_grams"] == 2  # 6 words, n=5 -> 2 grams


def test_ngram_novelty_short_doc_no_row(spark):
    docs = docs_df(spark, ["a b", "a b c d e"])
    out = TX.ngram_novelty(docs).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["n_grams"] == 1 and out[0]["novel_grams"] == 1


# -- rouge_overlap_pairs ----------------------------------------------

def test_rouge_overlap_set_scores(spark):
    from etl_portfolio_tracker_spark.operators import dedup as DD
    docs = docs_df(spark, ["a b c", "a b d"])
    pairs = spark.createDataFrame([(0, 1, 0.9)],
                                  "doc_a long, doc_b long, jaccard double")
    r = DD.rouge_overlap_pairs(docs, pairs=pairs).collect()[0]
    assert r["n_common_tokens"] == 2
    assert r["rouge1_p"] == round(2 / 3, 6)
    assert r["rouge1_r"] == round(2 / 3, 6)
    assert r["rouge1_f1"] == round(4 / 6, 6)


def test_rouge_overlap_distinct_token_semantics(spark):
    from etl_portfolio_tracker_spark.operators import dedup as DD
    # repeated tokens count once (set semantics, the documented unit)
    docs = docs_df(spark, ["a a a b", "a c"])
    pairs = spark.createDataFrame([(0, 1, 0.9)],
                                  "doc_a long, doc_b long, jaccard double")
    r = DD.rouge_overlap_pairs(docs, pairs=pairs).collect()[0]
    assert r["n_common_tokens"] == 1
    assert r["rouge1_r"] == 0.5     # |{a}| / |{a,b}|


# -- sales_cube_gid ---------------------------------------------------

def test_sales_cube_gid_lattice_invariants(spark, sf_dir):
    out = WH.sales_cube_gid(spark, sf_dir).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
    assert sorted(by_gid) == list(range(8))   # full 2^3 lattice
    total = by_gid[7][0]
    n_all = sum(r["n_rows"] for r in by_gid[0])
    assert total["n_rows"] == n_all           # leaves sum to the total
    assert abs(sum(r["revenue"] for r in by_gid[0])
               - total["revenue"]) < 0.05     # 2dp-rounded leaf sums
    # rolled-up columns are NULL exactly per the gid bit pattern
    for r in out:
        assert (r["ship_year"] is None) == bool(r["gid"] & 1)
        assert (r["l_linestatus"] is None) == bool(r["gid"] & 2)
        assert (r["l_returnflag"] is None) == bool(r["gid"] & 4)


# -- ohlc_bars --------------------------------------------------------

def test_ohlc_bars_tie_breaks_on_event_id(spark):
    t = dt.datetime(2024, 1, 3, 12, 0, 0)
    ev = events_df(spark, [
        (0, t, 1, "buy", 5.0),
        (1, t, 1, "buy", 7.0),          # same ts: event_id decides
        (2, t + dt.timedelta(hours=1), 1, "buy", 6.0),
    ])
    r = SE.ohlc_bars(ev).collect()[0]
    assert r["open"] == 5.0 and r["close"] == 6.0
    assert r["high"] == 7.0 and r["low"] == 5.0 and r["n_events"] == 3


def test_ohlc_bars_week_boundary_split(spark):
    # Sunday vs Monday land in different ISO weeks
    ev = events_df(spark, [
        (0, dt.datetime(2024, 1, 7, 23, 0), 1, "buy", 1.0),   # Sun
        (1, dt.datetime(2024, 1, 8, 1, 0), 1, "buy", 2.0),    # Mon
    ])
    assert SE.ohlc_bars(ev).count() == 2


# -- knn_classify -----------------------------------------------------

def test_knn_classify_majority_and_tiebreak(spark):
    vecs = [[1.0, 0.0],        # query (vec_id 0)
            [1.0, 0.01],       # label 1, closest
            [1.0, -0.01],      # label 2
            [0.9, 0.0],        # label 2
            [-1.0, 0.0]]       # label 1, far side
    emb = emb_df(spark, vecs, labels=[9, 1, 2, 2, 1])
    out = {r["vec_id"]: r
           for r in SIM.knn_classify(emb, k=3, query_mod=len(vecs))
           .collect()}
    r = out[0]
    assert r["pred_label"] == 2 and r["n_votes"] == 2
    # [0.9, 0] is PARALLEL to the query -> cosine exactly 1.0
    assert r["top1_id"] == 3 and r["top1_cos"] == 1.0
    assert r["is_correct"] is False


def test_knn_classify_vote_tie_prefers_smaller_label(spark):
    vecs = [[1.0, 0.0], [1.0, 0.1], [1.0, -0.1]]
    emb = emb_df(spark, vecs, labels=[5, 7, 3])
    r = SIM.knn_classify(emb, k=2, query_mod=len(vecs)).collect()[0]
    # one vote each for labels 3 and 7 -> smaller label wins
    assert r["pred_label"] == 3


# -- image phash ------------------------------------------------------

def test_phash_ppm_roundtrip_identity(spark):
    """The PPM encode->decode roundtrip is the identity on the
    synthesized gray rasters (the fact the oracle's math-only mirror
    relies on)."""
    import numpy as np
    from etl_portfolio_tracker_spark.operators import multimodal as MM
    docs = docs_df(spark, ["some steady text for the raster pipeline"])
    media = MM.text_to_images(docs).collect()[0]
    px = MM._decode_pixels(bytes(media["media"]))
    assert px.shape == (MM.PHASH_SIDE, MM.PHASH_SIDE, 3)
    assert (px[:, :, 0] == px[:, :, 1]).all()  # gray
    t = "some steady text for the raster pipeline"
    n, m = len(t), MM.PHASH_SIDE ** 2
    expect = [ord(t[(i * n) // m]) for i in range(m)]
    assert px[:, :, 0].ravel().tolist() == expect


def test_phash_substitution_near_dup_found(spark):
    from etl_portfolio_tracker_spark.operators import multimodal as MM
    base = ("hello world this is a document about sparks and rivers "
            "and more words to fill space")
    docs = docs_df(spark, [base,
                           base.replace("sparks", "sporks"),
                           "a completely different text with other "
                           "content entirely unlike the first pair"])
    pairs = MM.image_phash_pairs(docs).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["hamming"] <= MM.PHASH_MAX_HAMMING


def test_phash_empty_text_zero_hash(spark):
    from etl_portfolio_tracker_spark.operators import multimodal as MM
    out = MM.image_phash(MM.text_to_images(
        docs_df(spark, ["", "abc"]))).collect()
    by_id = {r["media_id"]: r for r in out}
    # uniform pad raster -> no cell exceeds the mean (strict >)
    assert by_id[0]["phash_hex"] == "0000000000000000"


def test_phash_band_packing_is_hex_of_bands(spark):
    from etl_portfolio_tracker_spark.operators import multimodal as MM
    r = MM.image_phash(MM.text_to_images(
        docs_df(spark, ["the quick brown fox jumps over the lazy dog "
                        "and keeps running far away"]))).collect()[0]
    assert r["phash_hex"] == "".join(
        format(r[f"band{b}"], "04X") for b in range(4))
    for b in range(4):
        assert 0 <= r[f"band{b}"] < 2 ** 16


# -- sequence_match ----------------------------------------------------

def test_sequence_match_order_and_share(spark):
    ev = events_df(spark, [
        (0, _t(9), 1, "view", 1.0), (1, _t(10), 1, "click", 1.0),
        (2, _t(11), 1, "purchase", 1.0),
        (3, _t(9), 2, "purchase", 1.0), (4, _t(10), 2, "view", 1.0)])
    out = {r["pattern"]: r for r in SE.sequence_match(ev).collect()}
    # user1 v->c->p matches; user2 bought BEFORE viewing -> no match
    assert out["view_click_buy"]["n_users_matched"] == 1
    assert out["view_click_buy"]["user_share"] == 0.5


def test_sequence_match_error_free_anchor(spark):
    ev = events_df(spark, [
        (0, _t(9), 1, "error", 1.0), (1, _t(10), 1, "purchase", 1.0),
        (2, _t(9), 2, "purchase", 1.0)])
    out = {r["pattern"]: r for r in SE.sequence_match(ev).collect()}
    # '^[^e]*p': user1 errored before buying, user2 did not
    assert out["error_free_buy"]["n_users_matched"] == 1


def test_sequence_match_same_ts_event_id_order(spark):
    ev = events_df(spark, [
        (0, _t(9), 1, "view", 1.0), (1, _t(9), 1, "click", 1.0),
        (2, _t(9), 1, "purchase", 1.0)])
    out = {r["pattern"]: r for r in SE.sequence_match(ev).collect()}
    assert out["view_click_buy"]["n_users_matched"] == 1


# -- attribution_last_touch --------------------------------------------

def test_attribution_buckets_and_never_clicked(spark):
    ev = events_df(spark, [
        (0, _t(9), 1, "click", 0.0),
        (1, _t(9, 30), 1, "purchase", 10.0),    # 30 min -> 0-1h
        (2, _t(12), 2, "click", 0.0),
        (3, dt.datetime(2024, 1, 2, 11), 2, "purchase", 20.0),  # 23h
        (4, _t(8), 3, "purchase", 40.0)])       # never clicked
    out = {r["attr_bucket"]: r
           for r in SE.attribution_last_touch(ev).collect()}
    assert out["0-1h"]["attributed_value"] == 10.0
    assert out["1h-24h"]["attributed_value"] == 20.0
    assert out["never_clicked"]["n_purchases"] == 1


def test_attribution_same_ts_click_not_prior(spark):
    # click at the SAME ts with larger event_id is NOT prior
    ev = events_df(spark, [
        (0, _t(9), 1, "purchase", 5.0), (1, _t(9), 1, "click", 0.0)])
    out = SE.attribution_last_touch(ev).collect()
    assert out[0]["attr_bucket"] == "never_clicked"


def test_attribution_last_click_wins(spark):
    ev = events_df(spark, [
        (0, _t(1), 1, "click", 0.0),            # stale click
        (1, _t(9, 59), 1, "click", 0.0),        # last touch
        (2, _t(10), 1, "purchase", 7.0)])
    out = SE.attribution_last_touch(ev).collect()
    assert out[0]["attr_bucket"] == "0-1h"


# -- embedding_drift_report --------------------------------------------

def test_embedding_drift_identical_halves(spark):
    # even and odd vectors identical -> zero drift, cosine 1
    emb = emb_df(spark, [[1.0, 2.0], [1.0, 2.0], [3.0, 1.0], [3.0, 1.0]])
    r = SIM.embedding_drift_report(emb).collect()[0]
    assert r["n_ref"] == 2 and r["n_cand"] == 2
    assert r["centroid_cos"] == 1.0
    assert r["centroid_l2"] == 0.0 and r["mean_abs_shift"] == 0.0


def test_embedding_drift_known_shift(spark):
    # ref mean = [1, 0]; cand mean = [0, 1] -> orthogonal centroids
    emb = emb_df(spark, [[1.0, 0.0], [0.0, 1.0]])
    r = SIM.embedding_drift_report(emb).collect()[0]
    assert r["centroid_cos"] == 0.0
    assert r["centroid_l2"] == round(math.sqrt(2), 6)
    assert r["max_shift_dim"] in (0, 1) and r["max_abs_shift"] == 1.0
    assert r["max_shift_dim"] == 0   # tie -> smaller dim


# -- cdc_merge_apply / streaming_attribution_replay --------------------

def test_cdc_merge_row_accounting(spark, sf_dir):
    from etl_portfolio_tracker_spark.io import read_table
    od = read_table(spark, sf_dir, "orders")
    out = WH.cdc_merge_apply(spark, sf_dir).collect()
    n_rows = sum(r["n_rows"] for r in out)
    n_upd = sum(r["n_updated"] for r in out)
    n_ins = sum(r["n_inserted"] for r in out)
    base = od.filter(F.col("o_orderkey") % 2 == 0)
    n_base = base.count()
    mods = od.filter(F.col("o_orderkey") % 2 == 1).select(
        (F.col("o_orderkey") % 10).alias("m"),
        (F.col("o_orderkey") - 1).alias("tgt")).collect()
    exp_ins = sum(1 for r in mods if r["m"] in (1, 3))
    base_keys = {r["o_orderkey"] for r in base.collect()}
    exp_upd = sum(1 for r in mods if r["m"] in (5, 7)
                  and r["tgt"] in base_keys)
    exp_del = sum(1 for r in mods if r["m"] == 9
                  and r["tgt"] in base_keys)
    assert n_ins == exp_ins and n_upd == exp_upd
    assert n_rows == n_base - exp_del + exp_ins


def test_streaming_attribution_equals_batch(spark, sf_dir):
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.streaming.replay import (
        streaming_attribution_replay)
    batch = sorted(map(tuple, SE.attribution_last_touch(
        read_table(spark, sf_dir, "events")).collect()))
    stream = sorted(map(tuple,
                        streaming_attribution_replay(spark, sf_dir)
                        .collect()))
    assert stream == batch

"""Hand-computed unit tests for the corpus-statistics operators."""

import math

from etl_portfolio_tracker_spark.operators import text as TX


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


def test_vocab_coverage_ranks_and_cumulates(spark):
    rows = [(0, "a a a b", "s"), (1, "b c", "s")]
    out = TX.vocab_coverage(_docs(spark, rows), k=2).toPandas()
    # freqs: a=3, b=2, c=1; total=6; top-2 = a, b
    assert list(out["token"]) == ["a", "b"]
    assert list(out["freq"]) == [3, 2]
    assert abs(out["cum_frac"][0] - round(3 / 6, 6)) < 1e-12
    assert abs(out["cum_frac"][1] - round(5 / 6, 6)) < 1e-12


def test_doc_length_histogram_buckets_by_bit_length(spark):
    rows = [(0, "w " * 1, "s"),        # 1 token  -> bucket 0
            (1, "w " * 2, "s"),        # 2 tokens -> bucket 1
            (2, "w " * 3, "s"),        # 3 tokens -> bucket 1
            (3, "w " * 8, "s")]        # 8 tokens -> bucket 3
    out = (TX.doc_length_histogram(_docs(spark, rows))
           .toPandas().set_index("len_bucket"))
    assert out.loc[0, "n_docs"] == 1 and out.loc[0, "max_tokens"] == 1
    assert out.loc[1, "n_docs"] == 2 and out.loc[1, "total_tokens"] == 5
    assert out.loc[3, "n_docs"] == 1 and out.loc[3, "min_tokens"] == 8


def test_source_divergence_zero_for_identical_distribution(spark):
    # both sources have the SAME unigram distribution as the corpus
    rows = [(0, "a b", "s1"), (1, "a b", "s2")]
    out = TX.source_divergence(_docs(spark, rows)).toPandas()
    assert list(out["kl_div"]) == [0.0, 0.0]
    assert list(out["vocab"]) == [2, 2]


def test_source_divergence_hand_value(spark):
    # corpus: a x3, b x1 (N=4); s1 = {a,a} (N_s=2), s2 = {a,b}
    rows = [(0, "a a", "s1"), (1, "a b", "s2")]
    out = (TX.source_divergence(_docs(spark, rows))
           .toPandas().set_index("source"))
    kl1 = 1.0 * math.log((2 * 4) / (2 * 3))        # only token a
    kl2 = 0.5 * math.log((1 * 4) / (2 * 3)) + 0.5 * math.log((1 * 4) / (2 * 1))
    assert abs(out.loc["s1", "kl_div"] - round(kl1, 6)) < 1e-9
    assert abs(out.loc["s2", "kl_div"] - round(kl2, 6)) < 1e-9


def test_bm25_ranks_term_matches_and_normalizes_length(spark):
    rows = [(0, "spark stream join", "s"),          # all 3 terms, short
            (1, "spark table table table table table table table", "s"),
            (2, "spark stream join " * 4, "s"),     # all terms, longer
            (3, "table scan filter", "s")]          # no query terms
    out = TX.bm25_search(_docs(spark, rows), k=10).toPandas()
    by_id = out.set_index("doc_id")
    # doc 3 matches nothing -> score exactly 0 and ranked last
    assert by_id.loc[3, "score"] == 0.0
    assert list(out["doc_id"])[-1] == 3
    # doc 0 (all three terms, shortest) outranks the long single-term doc
    assert by_id.loc[0, "score"] > by_id.loc[1, "score"]
    # tf columns are exact integers
    assert by_id.loc[2, "tf_spark"] == 4
    assert by_id.loc[1, "tf_spark"] == 1 and by_id.loc[1, "tf_join"] == 0
    # BM25 tf saturation: 4x the tf at 4x the length must not 4x the
    # score of the all-terms doc
    assert by_id.loc[2, "score"] < 4 * by_id.loc[0, "score"]


def test_posting_lists_head_df_and_tf(spark):
    rows = [(0, "spark spark join", "s"),
            (1, "join table", "s"),
            (2, "spark", "s"),
            (3, "nothing relevant", "s")]
    out = {r["term"]: r for r in
           TX.posting_lists(_docs(spark, rows), head=1).collect()}
    assert set(out) == {"spark", "join"}          # absent terms: no row
    assert out["spark"]["df"] == 2                # docs 0, 2
    assert out["spark"]["tf_total"] == 3          # 2 + 1 occurrences
    assert out["spark"]["postings_head"] == "0"   # head=1 cut
    assert out["join"]["df"] == 2
    assert out["join"]["postings_head"] == "0"

"""Round-4 operators on constructed micro-frames: word entropy, PMI
collocations, duplicated-span coverage, overlapping chunking,
stratified k-fold, semantic dedup."""

import hashlib
import math

from etl_portfolio_tracker_spark import schemas
from etl_portfolio_tracker_spark.operators import packing as PK
from etl_portfolio_tracker_spark.operators import similarity as SIM
from etl_portfolio_tracker_spark.operators import text as TX


def docs_df(spark, texts, sources=None):
    srcs = sources or ["src"] * len(texts)
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(zip(texts, srcs))],
        schema=schemas.DOCUMENTS)


def emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        schema=schemas.EMBEDDINGS)


# -- word_entropy ------------------------------------------------------

def test_word_entropy_degenerate_and_uniform(spark):
    out = {r["doc_id"]: r for r in TX.word_entropy(
        docs_df(spark, ["a a a a", "a b", "a a b b c c d d"])).collect()}
    # one distinct word → zero entropy
    assert out[0]["n_tokens"] == 4 and out[0]["n_distinct"] == 1
    assert out[0]["entropy"] == 0.0
    # two equally likely words → ln 2
    assert out[1]["entropy"] == round(math.log(2), 6)
    # four equally likely words → ln 4
    assert out[2]["entropy"] == round(math.log(4), 6)


def test_word_entropy_skewed(spark):
    # p = (3/4, 1/4): H = -(0.75 ln 0.75 + 0.25 ln 0.25)
    out = TX.word_entropy(docs_df(spark, ["a a a b"])).collect()[0]
    expect = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert out["entropy"] == round(expect, 6)


# -- pmi_top_pairs -----------------------------------------------------

def test_pmi_perfect_collocation(spark):
    # "x y" 5× in one doc: c12(x,y)=5, c1(x·)=5, c2(·y)=5, N=9 bigrams
    out = TX.pmi_top_pairs(docs_df(spark, ["x y x y x y x y x y"]),
                           k=5, min_count=5).collect()
    assert [(r["w1"], r["w2"], r["c12"]) for r in out] == [("x", "y", 5)]
    assert out[0]["pmi"] == round(math.log(5 * 9 / (5 * 5)), 6)


def test_pmi_min_count_filters(spark):
    # every bigram unique → nothing clears min_count
    assert TX.pmi_top_pairs(docs_df(spark, ["a b c d e"]),
                            min_count=2).count() == 0


# -- ngram_dup_spans ---------------------------------------------------

def test_ngram_dup_spans_shared_prefix(spark):
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    d = docs_df(spark, [shared + " a1 a2",       # 10 words, 3 grams
                        shared + " b1 b2 b3",    # 11 words, 4 grams
                        "q1 q2 q3 q4 q5 q6 q7 q8 q9"])  # no shared grams
    out = {r["doc_id"]: r for r in TX.ngram_dup_spans(d).collect()}
    # only the position-1 gram (the shared prefix) is duplicated
    assert (out[0]["n_grams"], out[0]["n_dup_grams"],
            out[0]["covered_words"]) == (3, 1, 8)
    assert out[0]["covered_frac"] == round(8 / 10, 6)
    assert (out[1]["n_dup_grams"], out[1]["covered_words"]) == (1, 8)
    assert (out[2]["n_dup_grams"], out[2]["covered_words"]) == (0, 0)


def test_ngram_dup_spans_short_doc(spark):
    # shorter than n → zero grams, zero coverage, frac 0
    out = TX.ngram_dup_spans(docs_df(spark, ["a b c"])).collect()[0]
    assert (out["n_grams"], out["covered_words"], out["covered_frac"]) \
        == (0, 0, 0.0)


# -- doc_chunks --------------------------------------------------------

def test_doc_chunks_overlap_and_trailing(spark):
    words = [f"t{i}" for i in range(1, 41)]           # 40 tokens
    out = sorted(PK.doc_chunks(docs_df(spark, [" ".join(words)])).collect(),
                 key=lambda r: r["chunk_idx"])
    assert [(r["chunk_idx"], r["chunk_start"], r["n_chunk_tokens"])
            for r in out] == [(0, 1, 32), (1, 25, 16)]
    # chunk hash is md5 of the space-joined window
    w0 = " ".join(words[0:32])
    assert out[0]["chunk_hash"] == hashlib.md5(w0.encode()).hexdigest()
    w1 = " ".join(words[24:40])
    assert out[1]["chunk_hash"] == hashlib.md5(w1.encode()).hexdigest()


def test_doc_chunks_every_token_covered(spark):
    words = [f"t{i}" for i in range(1, 101)]
    out = PK.doc_chunks(docs_df(spark, [" ".join(words)])).collect()
    covered = set()
    for r in out:
        covered.update(range(r["chunk_start"],
                             r["chunk_start"] + r["n_chunk_tokens"]))
    assert covered == set(range(1, 101))


# -- stratified_kfold --------------------------------------------------

def test_stratified_kfold_exact_balance(spark):
    d = docs_df(spark, [f"doc number {i}" for i in range(20)],
                sources=["s0"] * 10 + ["s1"] * 10)
    out = PK.stratified_kfold(d, k=5).collect()
    per = {}
    for r in out:
        per[(r["source"], r["fold"])] = per.get((r["source"], r["fold"]), 0) + 1
    # 10 docs per source into 5 folds → exactly 2 per (source, fold)
    assert all(v == 2 for v in per.values()) and len(per) == 10


def test_stratified_kfold_content_invariant(spark):
    # re-ingest under shifted doc_ids: same text → same source rank
    # order (hash ties broken by doc_id can't occur with distinct
    # texts) → same fold sequence
    texts = [f"alpha beta {i}" for i in range(10)]
    a = PK.stratified_kfold(docs_df(spark, texts), k=5).collect()
    b_rows = [(i + 100, t, "en", "src", len(t)) for i, t in enumerate(texts)]
    b_df = spark.createDataFrame(b_rows, schema=schemas.DOCUMENTS)
    b = PK.stratified_kfold(b_df, k=5).collect()
    fa = {r["doc_id"]: r["fold"] for r in a}
    fb = {r["doc_id"] - 100: r["fold"] for r in b}
    assert fa == fb


# -- semantic_dedup ----------------------------------------------------

def test_semantic_dedup_flags_near_copy(spark):
    # 8 near-orthogonal centroids (identity-ish dims) + vec 8 almost
    # equal to vec 0 → same cell, cosine ≈ 1 → flagged; vec 9 far from
    # everything in its cell → kept
    base = [[1.0 if j == i else 0.0 for j in range(8)] for i in range(8)]
    near0 = [0.99, 0.01, 0, 0, 0, 0, 0, 0]
    lone = [-1.0, -0.9, 0, 0, 0, 0, 0, 0]
    out = {r["vec_id"]: r for r in SIM.semantic_dedup(
        emb_df(spark, base + [near0, lone]), n_cells=8).collect()}
    assert out[8]["cell"] == 0 and out[8]["is_dup"]
    assert out[8]["max_earlier_cos"] > 0.99
    assert not out[0]["is_dup"]          # earliest member always kept
    assert not out[9]["is_dup"]


def test_semantic_dedup_keep_lowest_id(spark):
    # three copies of the same direction: 8 centroid defs then copies
    base = [[1.0 if j == i else 0.0 for j in range(8)] for i in range(8)]
    copy1 = [2.0, 0, 0, 0, 0, 0, 0, 0]   # same direction as vec 0
    copy2 = [3.0, 0, 0, 0, 0, 0, 0, 0]
    out = {r["vec_id"]: r["is_dup"] for r in SIM.semantic_dedup(
        emb_df(spark, base + [copy1, copy2]), n_cells=8).collect()}
    assert not out[0] and out[8] and out[9]


# -- mmr_topk ----------------------------------------------------------

def test_mmr_prefers_diversity_over_redundancy(spark):
    # q = vec 0. vecs 1,2 nearly identical and most relevant; vec 3
    # less relevant but orthogonal to them. Plain top-2 = {1, 2};
    # MMR's second pick trades redundancy for diversity → {1, 3}.
    e = emb_df(spark, [[1.0, 0.0, 0.0],
                       [0.98, 0.2, 0.0],
                       [0.99, 0.19, 0.0],
                       [0.5, 0.0, 0.9]])
    out = SIM.mmr_topk(e, query_vec_id=0, k=2, pool=3)
    picks = [r["vec_id"] for r in out.collect()]
    assert picks[0] == 2          # highest relevance first
    assert picks[1] == 3          # diverse beats redundant twin


def test_mmr_rank_one_is_cosine_argmax(spark):
    e = emb_df(spark, [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.7, 0.7]])
    out = SIM.mmr_topk(e, query_vec_id=0, k=3, pool=3).collect()
    top1 = SIM.cosine_topk(e, query_vec_id=0, k=1).collect()[0]
    assert out[0]["vec_id"] == top1["vec_id"]
    assert out[0]["relevance"] == top1["cos_sim"]
    # ranks are 1..k and picks are distinct
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert len({r["vec_id"] for r in out}) == 3


# -- minhash_estimate_error ---------------------------------------------

def test_minhash_estimate_error_identical_docs(spark):
    from etl_portfolio_tracker_spark.operators import dedup as DD
    d = docs_df(spark, ["the quick brown fox jumps over the lazy dog",
                        "the quick brown fox jumps over the lazy dog",
                        "zzzz xxxx yyyy wwww vvvv uuuu tttt ssss"])
    out = DD.minhash_estimate_error(d).collect()
    # identical docs: every per-seed minimum agrees, exact jaccard 1.0
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(0, 1)]
    r = out[0]
    assert r["n_match"] == DD.MINHASH_SEEDS
    assert r["est_jaccard"] == 1.0 and r["jaccard"] == 1.0
    assert r["err"] == 0.0


# -- kfold_leakage_report -----------------------------------------------

def test_kfold_leakage_detects_straddling_cluster(spark):
    from etl_portfolio_tracker_spark.operators import dedup as DD
    # docs 0/1 near-identical → one cluster; distinct content hashes
    # land them in different folds at k=5 → leaky
    d = docs_df(spark, ["the quick brown fox jumps over the lazy dog",
                        "the quick brown fox jumps over the lazy dogs",
                        "zzzz xxxx yyyy wwww vvvv uuuu tttt ssss"])
    out = DD.kfold_leakage_report(d, k=5).collect()
    assert len(out) == 1
    assert out[0]["cluster_size"] == 2 and out[0]["leaky"]
    # k=1 degenerates to a single fold → same cluster, not leaky
    out1 = DD.kfold_leakage_report(d, k=1).collect()
    assert out1[0]["n_folds"] == 1 and not out1[0]["leaky"]


def test_semantic_dedup_fast_agrees_with_exact(spark):
    # the float32 production variant must agree with the exact-decimal
    # form on cells and on every flag whose max-cosine sits a
    # float32-honest margin away from τ (threshold decisions tolerate
    # score noise; boundary vectors are the only legitimate deviation)
    from etl_portfolio_tracker_spark.io import read_table
    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    exact = {r["vec_id"]: r for r in SIM.semantic_dedup(emb).collect()}
    fast = {r["vec_id"]: r for r in SIM.semantic_dedup_fast(emb).collect()}
    assert set(exact) == set(fast)
    margin = 1e-4
    checked = 0
    cell_diverged = 0
    for vid, e in exact.items():
        f = fast[vid]
        if f["cell"] != e["cell"]:
            # float32 argmax near-ties may flip the cell (documented);
            # such vectors sit on a cell boundary — skip flag compare
            cell_diverged += 1
            continue
        mx = e["max_earlier_cos"]
        if mx is None:
            assert not f["is_dup"]
            continue
        assert abs(f["max_earlier_cos"] - mx) < 1e-3
        if abs(mx - SIM.SEMANTIC_DEDUP_TAU) > margin:
            assert f["is_dup"] == e["is_dup"], vid
            checked += 1
    assert cell_diverged <= len(exact) // 100   # ≤1% boundary tail
    assert checked > 400   # the agreement check actually ran


def test_lsh_recall_curve_known_values_and_monotonicity(spark):
    from etl_portfolio_tracker_spark.operators import dedup as DD
    rows = DD.lsh_recall_curve(spark).collect()
    assert len(rows) == 36          # 4 factorizations x 9 j points
    by_cfg = {}
    for r in rows:
        by_cfg.setdefault((r["n_bands"], r["rows_per_band"]),
                          []).append((r["j"], r["recall"]))
    # r=1, b=8: recall = 1 - (1-j)^8 exactly
    for j, rec in by_cfg[(8, 1)]:
        assert abs(rec - (1 - (1 - j) ** 8)) < 1e-6
    # the engine's own operating point (b=4, r=2) is present and its
    # S-curve is monotone increasing in j
    curve = sorted(by_cfg[(4, 2)])
    assert all(b[1] > a[1] for a, b in zip(curve, curve[1:]))
    # more rows per band -> stricter candidates: at fixed j=0.5,
    # recall falls as r grows
    at_half = [(cfg[1], dict(pts)[0.5]) for cfg, pts in
               ((c, p) for c, p in by_cfg.items())]
    at_half.sort()
    assert all(b[1] < a[1] for a, b in zip(at_half, at_half[1:]))


def test_semantic_clusters_transitive_chain(spark):
    # A~B and B~C above tau, but cos(A,C) below tau: all three must
    # share one cluster (the transitivity flags alone can't express)
    base = [[1.0 if j == i else 0.0 for j in range(8)] for i in range(8)]
    a = [1.0, 0.00, 0, 0, 0, 0, 0, 0]      # = centroid 0 direction
    bv = [1.0, 0.55, 0, 0, 0, 0, 0, 0]     # cos(a,b) ≈ 0.876
    cv = [1.0, 0.80, 0, 0, 0, 0, 0, 0]     # cos(b,c) ≈ 0.985, cos(a,c) ≈ 0.781
    e = emb_df(spark, base + [a, bv, cv])
    out = {r["vec_id"]: r["cluster_id"]
           for r in SIM.semantic_clusters(e, n_cells=8,
                                          threshold=0.85).collect()}
    # 8,9,10 are the chain (vec 0 is centroid-only direction but also
    # a member: cos(0, 8) = 1.0 ≥ τ links it in too)
    assert out[8] == out[9] == out[10] == out[0]
    # unrelated axis vector stays a singleton
    assert out[3] == 3
    # every vector appears exactly once
    assert len(out) == 11

"""Tier-E tests: dedup, similarity, text analysis, multimodal plumbing
on tiny in-memory frames."""

from etl_portfolio_tracker_spark import schemas
from etl_portfolio_tracker_spark.operators import dedup as DD
from etl_portfolio_tracker_spark.operators import multimodal as MM
from etl_portfolio_tracker_spark.operators import similarity as SIM
from etl_portfolio_tracker_spark.operators import text as TX


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        schema=schemas.DOCUMENTS)


def test_exact_dedup(spark):
    d = docs_df(spark, ["hello world", "hello world", "other text"])
    out = {r["keep_id"]: r["n_copies"] for r in DD.exact_dedup(d).collect()}
    assert out == {0: 2, 2: 1}


def test_ngram_jaccard_identical_and_disjoint(spark):
    d = docs_df(spark, ["abcdefghij", "abcdefghij", "zzzzzzzzzz"])
    pairs = DD.ngram_jaccard_pairs(d, threshold=0.5).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["doc_a"], p["doc_b"], p["jaccard"]) == (0, 1, 1.0)


def test_minhash_identical_docs_all_bands_agree(spark):
    d = docs_df(spark, ["the quick brown fox jumps", "the quick brown fox jumps",
                        "completely different words here"])
    cands = {(r["doc_a"], r["doc_b"]): r["n_bands"]
             for r in DD.minhash_lsh_candidates(d).collect()}
    assert cands.get((0, 1)) == DD.MINHASH_SEEDS // DD.LSH_BAND_ROWS
    assert (0, 2) not in cands and (1, 2) not in cands


def test_simhash_identical_equal(spark):
    d = docs_df(spark, ["alpha beta gamma", "alpha beta gamma", "delta epsilon"])
    s = {r["doc_id"]: r["simhash"] for r in DD.simhash(d).collect()}
    assert s[0] == s[1] and s[0] != s[2]
    assert all(0 <= v < 2 ** 16 for v in s.values())


def emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        schema=schemas.EMBEDDINGS)


def test_cosine_topk_orders_by_similarity(spark):
    e = emb_df(spark, [[1, 0, 0], [1, 0.01, 0], [0, 1, 0], [-1, 0, 0]])
    got = [r["vec_id"] for r in SIM.cosine_topk(e, 0, k=3).collect()]
    assert got == [1, 2, 3]  # near-parallel, orthogonal, antiparallel


def test_lsh_buckets_identical_vectors_collide(spark):
    e = emb_df(spark, [[1, 2, 3], [1, 2, 3], [-9, 4, -7]])
    b = {r["vec_id"]: r["bucket"] for r in SIM.lsh_buckets(e).collect()}
    assert b[0] == b[1]
    pairs = {(r["vec_a"], r["vec_b"]) for r in SIM.embedding_near_dup_pairs(e).collect()}
    assert (0, 1) in pairs


def test_quality_and_tokens(spark):
    d = docs_df(spark, ["the cat of doom", "xyz"])
    q = {r["doc_id"]: r for r in TX.quality_score(d).collect()}
    assert q[0]["n_tokens"] == 4 and q[0]["n_stopwords"] == 2
    assert q[0]["stopword_ratio"] == 0.5
    t = {r["doc_id"]: r for r in TX.token_stats(d).collect()}
    assert t[0]["n_ws_tokens"] == 4 and t[1]["n_word_tokens"] == 1


def test_language_id_markers(spark):
    d = docs_df(spark, ["der hund und die katze ist", "the dog and the cat"])
    out = {r["doc_id"]: r["lang_pred"] for r in TX.language_id(d).collect()}
    assert out == {0: "de", 1: "en"}


def test_multimodal_decode_plumbing(spark):
    d = docs_df(spark, ["payload one", "payload two longer"])
    media = MM.docs_as_media(d)
    decoded = {r["media_id"]: r for r in MM.decode_media(media).collect()}
    assert decoded[0]["n_bytes"] == len("payload one")
    assert decoded[0]["magic_hex"] == "payl".encode().hex()
    # deterministic fake decode is stable
    assert decoded[0]["decoded_width"] == len("payload one") % 640 + 1
    meta = {r["media_id"]: r["n_bytes"] for r in MM.media_meta(media).collect()}
    assert meta == {0: 11, 1: 18}


def test_tfidf_top_terms_ranking(spark):
    # "rare" appears once in doc0 only (df=1); "common" in all docs.
    d = docs_df(spark, ["rare common common", "common", "common"])
    rows = {(r["doc_id"], r["rank"]): r
            for r in TX.tfidf_top_terms(d, k=2, max_doc_id=1).collect()}
    # doc0: common tf=2 wins on tf; rare tf=1 df=1 second
    assert rows[(0, 1)]["term"] == "common" and rows[(0, 1)]["tf"] == 2
    assert rows[(0, 2)]["term"] == "rare" and rows[(0, 2)]["df"] == 1
    assert rows[(0, 1)]["n_docs"] == 3
    assert set(r[0] for r in rows) == {0}  # bounded to doc_id < 1

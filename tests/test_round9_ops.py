"""Round-9 tests (VERDICT r8 Next items 5, 6, 7 + ADVICE lows).

- MINHASH_BUCKET_CAP drop semantics exercised cross-engine on a
  corpus where the cap actually BINDS (item 5: the cap "never binds
  at oracle scales", so its dropped-bucket behavior was
  design-asserted only).
- curation_serve: the persisted-index serving form must be bit-equal
  to the in-session minhash_verified pipeline (item 6).
- 3-batch streaming soaks with out-of-order arrivals for the
  stateful family (item 7): the two-batch checkpoint tests pin state
  carry-over; three batches + shuffled within-batch order exercise
  resume-after-resume and the arrival-order contracts.
- source_js_divergence now emits DISJOINT source pairs explicitly
  (ADVICE low 2).
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pytest

TESTDATA = "/root/testdata"


# --- MINHASH_BUCKET_CAP binding semantics (VERDICT r8 item 5) -----------------

def _cap_corpus():
    """9 docs: ids 0-5 are byte-identical (every band bucket holds all
    6 -> a cap of 3 BINDS and drops them), ids 6-7 are byte-identical
    to each other (bucket size 2 <= cap -> kept), id 8 is unique."""
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "completely different text about weighted set similarity join"
    c = "a third unrelated document that matches nothing else at all"
    return [(i, a) for i in range(6)] + [(6, b), (7, b)] + [(8, c)]


def test_minhash_bucket_cap_binds_cross_engine(spark):
    """The drop rule, evaluated where it BINDS, must agree between the
    Spark operator and the DuckDB oracle formulation (same QUALIFY
    cap), and the suppressed group must reappear when the cap does
    not bind — proving the cap is what suppressed it."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as E
    from etl_portfolio_tracker_spark.operators import dedup as DD

    rows = _cap_corpus()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cap = 3

    got = sorted(
        (r["doc_a"], r["doc_b"], r["n_bands"])
        for r in DD.minhash_lsh_candidates(docs, bucket_cap=cap).collect())

    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = (E._SHINGLES_SQL.replace("SELECT DISTINCT", "SELECT")
           + E._BANDS_SQL.format(n_seeds=DD.MINHASH_SEEDS - 1,
                                 band_rows=DD.LSH_BAND_ROWS)
           + f"""
        , kept AS (
            SELECT band, band_key, doc_id FROM bands
            QUALIFY COUNT(*) OVER (PARTITION BY band, band_key) <= {cap})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS n_bands
        FROM kept a JOIN kept b USING (band, band_key)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2 ORDER BY 1, 2""")
    want = [tuple(r) for r in con.execute(sql).fetchall()]

    n_bands = DD.MINHASH_SEEDS // DD.LSH_BAND_ROWS
    assert got == want == [(6, 7, n_bands)]   # the capped 6-clone
    #                                           group emits NOTHING

    # cap not binding -> the clone group's 15 pairs all reappear
    uncapped = sorted(
        (r["doc_a"], r["doc_b"])
        for r in DD.minhash_lsh_candidates(docs, bucket_cap=500).collect())
    assert uncapped == sorted(
        [(i, j) for i in range(6) for j in range(i + 1, 6)] + [(6, 7)])


def test_minhash_verified_respects_cap(spark):
    """End-to-end: minhash_verified built on capped candidates must
    not emit the capped group's (identical, jaccard=1.0) pairs."""
    from etl_portfolio_tracker_spark.operators import dedup as DD

    docs = spark.createDataFrame(_cap_corpus(), "doc_id long, text string")
    cands = DD.minhash_lsh_candidates(docs, bucket_cap=3)
    got = sorted((r["doc_a"], r["doc_b"], r["jaccard"])
                 for r in DD.minhash_verified(docs, cands=cands).collect())
    assert got == [(6, 7, 1.0)]


# --- curation_serve (VERDICT r8 item 6) ---------------------------------------

def test_curation_serve_matches_in_session_pipeline(spark, tmp_path):
    """Serving from the persisted band-key index must be bit-equal to
    the in-session minhash_verified pipeline."""
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.operators import dedup as DD

    sf = os.path.join(TESTDATA, "sf0.001")
    docs = read_table(spark, sf, "documents")
    idx = str(tmp_path / "bandkey_index")
    DD.minhash_band_keys(docs).write.parquet(idx)
    got = sorted(map(tuple, DD.curation_serve(docs, idx).collect()))
    want = sorted(map(tuple, DD.minhash_verified(docs).collect()))
    assert got == want and len(got) > 0


def test_curation_serve_registered_query(spark):
    """The registered query must build the index via _curation and
    serve the identical verified-pairs frame."""
    import __spark_entry__ as E

    sf = os.path.join(TESTDATA, "sf0.001")
    got = sorted(map(tuple, E.queries()["curation_serve"](spark, sf).collect()))
    want = sorted(map(tuple,
                      E.queries()["minhash_verified"](spark, sf).collect()))
    assert got == want and len(got) > 0


# --- 3-batch streaming soaks (VERDICT r8 item 7) ------------------------------
# Arrival-order contracts under test: WITHIN a batch, arbitrary order
# (the kernels sort); ACROSS batches, the day-atomic daily-ingest
# contract for TWR / (ts,id)-monotone ingest for the fold — the same
# divergence-from-unbounded-batch rule SURVEY §2.12 documents. The
# dedup-within soak sends true cross-batch LATE duplicates inside the
# watermark, which the state must still drop.

def _twr_panel_rows():
    rows = []
    for day in range(9):
        d = dt.date(2024, 3, 1) + dt.timedelta(days=day)
        for tkr, base in (("AAA", 10.0), ("BBB", 20.0)):
            rows.append(("u1", tkr, d, 5.0 + day % 3, base + 1.5 * day))
        rows.append(("u2", "CCC", d, 2.0, 7.0 + 0.5 * day))
    return rows


def test_streaming_twr_three_batch_soak(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_portfolio_tracker_spark.streaming.replay import (
        STATE_PARTITIONS, streaming_twr_replay)
    from etl_portfolio_tracker_spark.streaming.stateful import (
        streaming_twr_state)

    schema = ("user string, ticker string, ts date, qty double,"
              " close_i double")
    rows = _twr_panel_rows()
    panel = spark.createDataFrame(rows, schema)
    single = sorted(map(tuple,
                        streaming_twr_replay(spark, panel).collect()))

    stage, cp = str(tmp_path / "stage"), str(tmp_path / "cp")
    got: list = []

    def sink(df, _bid):
        got.extend(map(tuple,
                       df.select("user", "d", "port_ret", "twr_idx")
                         .collect()))

    def run_once():
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(STATE_PARTITIONS))
        try:
            src = spark.readStream.schema(panel.schema).parquet(stage)
            q = (streaming_twr_state(src).writeStream
                 .foreachBatch(sink)
                 .option("checkpointLocation", cp)
                 .outputMode("update").trigger(availableNow=True).start())
            assert q.awaitTermination(180)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    # three day-range batches; rows SHUFFLED within each batch (the
    # kernel must sort), day-atomic across batches
    cuts = [dt.date(2024, 3, 4), dt.date(2024, 3, 7)]
    batches = [
        [r for r in rows if r[2] < cuts[0]],
        [r for r in rows if cuts[0] <= r[2] < cuts[1]],
        [r for r in rows if r[2] >= cuts[1]],
    ]
    seen = 0
    for i, b in enumerate(batches):
        random.Random(i).shuffle(b)
        spark.createDataFrame(b, schema).coalesce(1) \
             .write.mode("append").parquet(stage)
        run_once()
        assert len(got) > seen, f"batch {i} emitted nothing"
        seen = len(got)
    assert sorted(got) == single


def test_streaming_fold_three_batch_soak(spark, tmp_path):
    """GAV-fold state across three resumes, within-batch arrival order
    shuffled: final per-key state must equal the batch fold."""
    from pyspark.sql import functions as F

    from etl_portfolio_tracker_spark.operators import fold as FO
    from etl_portfolio_tracker_spark.streaming import stateful

    schema = ("id long, user string, ticker string, ts timestamp, "
              "side string, qty double, price double, fee double")
    t0 = dt.datetime(2025, 2, 1)
    trades = []
    rng = random.Random(7)
    i = 0
    for day in range(9):
        for user in ("u1", "u2"):
            for tkr in ("T", "S"):
                side = "BUY" if (day + i) % 3 else "SELL"
                trades.append((i, user, tkr, t0 + dt.timedelta(days=day),
                               side, float(1 + i % 4),
                               100.0 + 3.0 * day + i % 5, 0.5))
                i += 1

    stage, cp, out = (str(tmp_path / "t"), str(tmp_path / "cp"),
                      str(tmp_path / "out"))

    def run_once():
        src = spark.readStream.schema(schema).parquet(stage)

        def _sink(batch, bid):
            batch.withColumn("bid", F.lit(bid)) \
                 .write.mode("append").parquet(out)

        q = (stateful.streaming_portfolio_state(src)
             .writeStream.foreachBatch(_sink)
             .outputMode("update")
             .option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(180)

    # three batches split on trade DAYS (monotone ingest), shuffled
    # within each batch
    spans = [(0, 3), (3, 6), (6, 9)]
    for j, (lo, hi) in enumerate(spans):
        b = [r for r in trades
             if lo <= (r[3] - t0).days < hi]
        random.Random(j).shuffle(b)
        spark.createDataFrame(b, schema).coalesce(1) \
             .write.mode("append").parquet(stage)
        run_once()

    final = {(r["user"], r["ticker"]): (r["qty"], r["avg_cost"],
                                        r["realized"])
             for r in (spark.read.parquet(out)
                       .groupBy("user", "ticker")
                       .agg(*[F.max_by(c, "bid").alias(c)
                              for c in ("qty", "avg_cost", "realized")])
                       ).collect()}
    batch_df = spark.createDataFrame(trades, schema)
    want = {(r["user"], r["ticker"]): (r["qty"], r["avg_cost"],
                                       r["realized"])
            for r in FO.portfolio_fold(batch_df).collect()}
    for k, v in want.items():
        assert final[k] == v, (k, final[k], v)


def test_streaming_dedup_within_three_batch_late_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark across three resumes: duplicate
    keys re-arriving in LATER batches — out of order, but inside the
    watermark — must still be dropped; fresh keys must pass."""
    from pyspark.sql import functions as F

    schema = "event_id long, ts timestamp"
    t0 = dt.datetime(2025, 6, 10, 12, 0, 0)
    stage, cp, out = (str(tmp_path / "ev"), str(tmp_path / "cp"),
                      str(tmp_path / "out"))

    def run_once():
        # memory sink can't recover from a checkpoint → foreachBatch
        src = spark.readStream.schema(schema).parquet(stage)

        def _sink(batch, _bid):
            batch.write.mode("append").parquet(out)

        q = (src.withWatermark("ts", "7 days")
             .dropDuplicatesWithinWatermark(["event_id"])
             .writeStream.foreachBatch(_sink)
             .option("checkpointLocation", cp)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(180)

    batches = [
        # batch 1: ids 1-3
        [(1, t0), (2, t0 + dt.timedelta(hours=1)),
         (3, t0 + dt.timedelta(hours=2))],
        # batch 2: id 2 re-arrives LATE (earlier ts than first sight,
        # still inside the 7-day watermark) + fresh id 4
        [(2, t0 - dt.timedelta(hours=5)),
         (4, t0 + dt.timedelta(days=1))],
        # batch 3: ids 1 and 4 re-arrive again + fresh id 5
        [(1, t0 + dt.timedelta(days=1, hours=3)),
         (4, t0 + dt.timedelta(hours=20)),
         (5, t0 + dt.timedelta(days=2))],
    ]
    for j, b in enumerate(batches):
        spark.createDataFrame(b, schema).coalesce(1) \
             .write.mode("append").parquet(stage)
        run_once()
    got = sorted(r["event_id"]
                 for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4, 5]


# --- source_js_divergence disjoint pairs (ADVICE r8 low 2) --------------------

def test_source_js_disjoint_pairs_emitted(spark):
    """Sources sharing zero words must appear with n_shared_words=0,
    jsd=ln 2 (6dp), jsd_norm=1.0 — not be silently absent."""
    import math

    from etl_portfolio_tracker_spark.operators import text as TX

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma", "s1"),
         (1, "delta epsilon zeta", "s2"),
         (2, "alpha delta", "s3")],
        "doc_id long, text string, source string")
    rows = {(r["source_a"], r["source_b"]): r
            for r in TX.source_js_divergence(docs).collect()}
    assert set(rows) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    dis = rows[("s1", "s2")]
    assert dis["n_shared_words"] == 0
    assert dis["jsd"] == round(math.log(2.0), 6)
    assert dis["jsd_norm"] == 1.0
    assert rows[("s1", "s3")]["n_shared_words"] == 1
    assert rows[("s2", "s3")]["n_shared_words"] == 1


# --- new round-9 operators -----------------------------------------------------

def test_holt_winters_matches_reference_recursion(spark):
    from etl_portfolio_tracker_spark.operators import windowed as WD

    xs = [10.0, 12.0, 11.0, 15.0, 14.5, 18.0]
    rows = [("T", dt.date(2024, 1, 1) + dt.timedelta(days=i), x)
            for i, x in enumerate(xs)]
    got = {r["ts"]: r for r in WD.holt_winters(
        spark.createDataFrame(rows, "ticker string, ts date, close double")
    ).collect()}
    l, b = xs[0], 0.0
    for i, x in enumerate(xs):
        if i:
            ln = 0.5 * x + 0.5 * (l + b)
            b = 0.25 * (ln - l) + 0.75 * b
            l = ln
        r = got[dt.date(2024, 1, 1) + dt.timedelta(days=i)]
        assert r["level"] == round(l, 6) or abs(r["level"] - l) < 5e-7
        assert abs(r["trend"] - b) < 5e-7
        assert abs(r["forecast"] - (l + b)) < 5e-7


def test_adamic_adar_known_graph(spark, monkeypatch, tmp_path):
    """Two orders: o1={1,2}, o2={1,2,3}. AA(1,2) = 1/ln2 + 1/ln3,
    AA(1,3) = AA(2,3) = 1/ln3; support threshold 1 keeps all."""
    import math

    from etl_portfolio_tracker_spark.operators import warehouse as WH

    li = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3)]
    spark.createDataFrame(li, "l_orderkey long, l_partkey long") \
         .write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {(r["part_a"], r["part_b"]): (r["support"], r["aa_score"])
           for r in WH.adamic_adar(spark, str(tmp_path),
                                   min_support=1).collect()}
    assert got[(1, 2)][0] == 2
    assert abs(got[(1, 2)][1]
               - (1 / math.log(2) + 1 / math.log(3))) < 2e-6
    assert abs(got[(1, 3)][1] - 1 / math.log(3)) < 2e-6
    assert got[(1, 3)][0] == got[(2, 3)][0] == 1


def test_dsir_weights_prefer_target_lang(spark):
    """Docs written in the target slice's vocabulary must score higher
    than docs from a disjoint vocabulary."""
    from etl_portfolio_tracker_spark.operators import text as TX

    en = "the cat sat on the mat with the hat"
    zh = "wu li hua xue sheng wu di li shu xue"
    docs = spark.createDataFrame(
        [(i, en, "en", "s", 1) for i in range(4)]
        + [(10 + i, zh, "zh", "s", 1) for i in range(4)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    w = {r["doc_id"]: r["dsir_logweight"]
         for r in TX.dsir_weights(docs).collect()}
    assert w[0] > w[10]
    assert all(w[i] == w[0] for i in range(4))
    assert all(w[10 + i] == w[10] for i in range(4))


def test_kcenter_coreset_greedy_on_plane(spark):
    """2D points where the farthest-point order is hand-checkable:
    seed = min id (origin), then the far corner, then the remaining
    extremes."""
    from etl_portfolio_tracker_spark.operators import similarity as SIM

    pts = {0: [0.0, 0.0], 1: [10.0, 10.0], 2: [10.0, 0.0],
           3: [0.0, 10.0], 4: [5.0, 5.0], 5: [1.0, 1.0]}
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts.items()],
        "vec_id long, embedding array<float>")
    rows = SIM.kcenter_coreset(emb, k=4).collect()
    order = [r["vec_id"] for r in rows]
    assert order[0] == 0 and rows[0]["min_sq_dist"] is None
    assert order[1] == 1 and rows[1]["min_sq_dist"] == 200.0
    # after {0,1}: pts 2 and 3 both at 100 from the set → lowest id
    assert order[2] == 2 and rows[2]["min_sq_dist"] == 100.0
    assert order[3] == 3 and rows[3]["min_sq_dist"] == 100.0


def test_streaming_holt_three_batch_soak(spark, tmp_path):
    """Holt keyed state across three resumes must reproduce the batch
    recursion exactly (day-atomic batches, shuffled within batch)."""
    from pyspark.sql import functions as F

    from etl_portfolio_tracker_spark.operators import windowed as WD
    from etl_portfolio_tracker_spark.streaming.stateful import (
        streaming_holt_state)

    schema = "ticker string, ts date, close double"
    rows = [(t, dt.date(2024, 5, 1) + dt.timedelta(days=i),
             10.0 * (k + 1) + 1.5 * i + (i % 3))
            for k, t in enumerate(("AAA", "BBB"))
            for i, _ in enumerate(range(9))]
    single = sorted(map(tuple, WD.holt_winters(
        spark.createDataFrame(rows, schema)).collect()))

    stage, cp = str(tmp_path / "px"), str(tmp_path / "cp")
    got: list = []

    def sink(df, _bid):
        got.extend(map(tuple, df.collect()))

    def run_once():
        src = spark.readStream.schema(
            spark.createDataFrame(rows, schema).schema).parquet(stage)
        q = (streaming_holt_state(src).writeStream
             .foreachBatch(sink)
             .option("checkpointLocation", cp)
             .outputMode("update").trigger(availableNow=True).start())
        assert q.awaitTermination(180)

    cuts = [dt.date(2024, 5, 4), dt.date(2024, 5, 7)]
    batches = [
        [r for r in rows if r[1] < cuts[0]],
        [r for r in rows if cuts[0] <= r[1] < cuts[1]],
        [r for r in rows if r[1] >= cuts[1]],
    ]
    for j, b in enumerate(batches):
        random.Random(j).shuffle(b)
        spark.createDataFrame(b, schema).coalesce(1) \
             .write.mode("append").parquet(stage)
        run_once()
    assert sorted(got) == single


def test_streaming_dsir_unseen_bucket_default(spark, tmp_path):
    """A delta doc whose vocabulary the corpus never saw must score
    n_tokens · ln((N_raw+B)/(N_tgt+B)) — the closed-form smoothed
    default (c_t = c_r = 0), not drop its tokens."""
    import math

    from etl_portfolio_tracker_spark.operators.text import DSIR_BUCKETS
    from etl_portfolio_tracker_spark.streaming.replay import (
        streaming_dsir_replay)

    corpus_text = "the cat sat on the mat"          # 6 tokens
    rows = ([(i, corpus_text, "en", "s", 1) for i in range(4)]
            + [(4, corpus_text, "de", "s", 1)]      # 24 en + 6 de
            + [(9, "zzzq xxxj qqqv", "de", "s", 1)])  # delta, unseen
    import pyarrow as pa
    import pyarrow.parquet as pq
    # one FILE named documents.parquet (the testdata layout the
    # replay's pathGlobFilter expects), not a Spark output directory
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": [r[1] for r in rows],
        "lang": [r[2] for r in rows],
        "source": [r[3] for r in rows],
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in
           streaming_dsir_replay(spark, str(tmp_path)).collect()}
    assert set(out) == {9}
    r = out[9]
    assert r["n_tokens"] == 3
    nr, nt = 30, 24
    want = 3 * math.log((nr + DSIR_BUCKETS) / (nt + DSIR_BUCKETS))
    assert abs(r["dsir_logweight"] - want) < 3e-6


def test_kcenter_distances_non_increasing(spark):
    """Greedy farthest-point: the selected max-min distance is
    non-increasing as the chosen set grows (textbook invariant)."""
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.operators import similarity as SIM

    emb = read_table(spark, os.path.join(TESTDATA, "sf0.001"),
                     "embeddings")
    rows = SIM.kcenter_coreset(emb, k=6).collect()
    dists = [r["min_sq_dist"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    assert len({r["vec_id"] for r in rows}) == 6


def test_adamic_adar_support_matches_market_basket(spark):
    """adamic_adar's support column is market_basket's co-count —
    the two operators must agree on every common pair."""
    import __spark_entry__ as E

    sf = os.path.join(TESTDATA, "sf0.001")
    aa = {(r["part_a"], r["part_b"]): r["support"]
          for r in E.queries()["adamic_adar"](spark, sf).collect()}
    mb = {(r["part_a"], r["part_b"]): r["support"]
          for r in E.queries()["market_basket"](spark, sf).collect()}
    assert set(aa) == set(mb) and len(aa) > 0
    for k in aa:
        assert aa[k] == mb[k]


def test_quantile_normalize_endpoints_and_alignment(spark):
    """Source-extreme docs map to the global distribution's extremes
    (r=0 -> global min, r=1 -> global max), and equal within-source
    ranks map to equal normalized values across sources."""
    from etl_portfolio_tracker_spark.operators import text as TX

    # sA: short words (low alpha ratio spread), sB: same texts plus
    # padding chars -> shifted raw quality, same rank structure
    texts_a = ["aa bb", "aa bb cc", "aa bb cc dd", "aa bb cc dd ee"]
    texts_b = [t + " zzzz" for t in texts_a]
    rows = ([(i, t, "en", "sA", 1) for i, t in enumerate(texts_a)]
            + [(10 + i, t, "en", "sB", 1)
               for i, t in enumerate(texts_b)])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = {r["doc_id"]: r for r in TX.quantile_normalize(docs).collect()}
    qs = sorted(r["quality"] for r in out.values())
    a = sorted((r["src_rank_pct"], r["quality_qn"])
               for r in out.values() if r["source"] == "sA")
    b = sorted((r["src_rank_pct"], r["quality_qn"])
               for r in out.values() if r["source"] == "sB")
    # same rank structure -> identical normalized curves
    assert [x[0] for x in a] == [x[0] for x in b]
    assert [x[1] for x in a] == [x[1] for x in b]
    assert a[0][0] == 0.0 and a[-1][0] == 1.0
    assert a[0][1] == round(qs[0], 6)     # r=0 -> global min
    assert a[-1][1] == round(qs[-1], 6)   # r=1 -> global max

"""Sketch-tier operators (HyperLogLog / count-min / Bloom) plus the
round-5 second-batch stats ops, on constructed micro-frames and
sf0.001 invariants. The oracle gate (tools/check.py) proves
bit-exactness against DuckDB; these tests pin the SEMANTIC guarantees
each sketch must honor at any scale: HLL registers bound rho, CMS
never underestimates, Bloom never yields a false negative."""

import datetime as dt
import hashlib
import math

from pyspark.sql import functions as F

from etl_portfolio_tracker_spark import schemas
from etl_portfolio_tracker_spark.operators import sketches as SK
from etl_portfolio_tracker_spark.operators import similarity as SIM
from etl_portfolio_tracker_spark.operators import text as TX

from test_round5_ops import docs_df, emb_df, events_df


def _h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# -- hll_distinct ------------------------------------------------------

def _ev_rows(n_users, event_type="click"):
    t0 = dt.datetime(2024, 1, 1)
    return [(i, t0 + dt.timedelta(minutes=i), i % n_users, event_type, 1.0)
            for i in range(3 * n_users)]


def test_hll_matches_python_reference(spark):
    """Register construction and raw estimate agree with a from-
    scratch Python HLL over the same md5-slice hash."""
    ev = events_df(spark, _ev_rows(40))
    out = SK.hll_distinct(ev).collect()
    assert len(out) == 1
    row = out[0]
    regs = {}
    for u in range(40):
        h = _h32_py(str(u))
        reg, w = h % SK.HLL_M, h // SK.HLL_M
        rho = SK.HLL_RHO_MAX if w == 0 else SK.HLL_RHO_MAX - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    s = sum(2.0 ** -r for r in regs.values()) + (SK.HLL_M - len(regs))
    assert row["v_zero"] == SK.HLL_M - len(regs)
    assert row["raw_estimate"] == round(SK.HLL_ALPHA_M2 / s, 6)
    assert row["exact_distinct"] == 40


def test_hll_insensitive_to_duplication(spark):
    """Cardinality sketch must ignore multiplicity: duplicating every
    event leaves all registers (hence the estimate) unchanged."""
    rows = _ev_rows(25)
    one = SK.hll_distinct(events_df(spark, rows)).collect()[0]
    dup = SK.hll_distinct(events_df(
        spark, rows + [(i + 10000, ts, u, et, v)
                       for (i, ts, u, et, v) in rows])).collect()[0]
    assert one["raw_estimate"] == dup["raw_estimate"]
    assert one["exact_distinct"] == dup["exact_distinct"]


def test_hll_groups_are_independent(spark):
    ev = events_df(spark, _ev_rows(10, "a") + _ev_rows(30, "b"))
    out = {r["event_type"]: r for r in SK.hll_distinct(ev).collect()}
    assert out["a"]["exact_distinct"] == 10
    assert out["b"]["exact_distinct"] == 30
    solo = SK.hll_distinct(events_df(spark, _ev_rows(10, "a"))).collect()[0]
    assert out["a"]["raw_estimate"] == solo["raw_estimate"]


# -- cms_heavy_hitters -------------------------------------------------

def test_cms_never_underestimates(spark, sf_dir):
    from etl_portfolio_tracker_spark.io import read_table
    out = SK.cms_heavy_hitters(read_table(spark, sf_dir, "documents"))
    rows = out.collect()
    assert 0 < len(rows) <= SK.CMS_TOPK
    assert all(r["overestimate"] >= 0 for r in rows)
    assert all(r["cms_estimate"] == r["true_count"] + r["overestimate"]
               for r in rows)


def test_cms_exact_when_no_collision(spark):
    """With far fewer distinct tokens than counters, MIN over 4
    independent rows is collision-free w.h.p. — for this fixed corpus
    the estimate must equal the true count exactly."""
    rows = SK.cms_heavy_hitters(
        docs_df(spark, ["x x x y", "y z"])).collect()
    got = {r["token"]: r for r in rows}
    assert got["x"]["true_count"] == 3
    assert all(r["overestimate"] == 0 for r in rows)


def test_cms_topk_order_and_tiebreak(spark):
    rows = SK.cms_heavy_hitters(
        docs_df(spark, ["b a b a c"]), topk=2).collect()
    assert [r["token"] for r in rows] == ["a", "b"]  # 2-2 tie → token asc


# -- bloom_chunk_probe -------------------------------------------------

def test_bloom_no_false_negatives(spark, sf_dir):
    """The Bloom contract: every exact duplicate chunk MUST be a
    bloom hit (n_false_pos accounts for the rest)."""
    from etl_portfolio_tracker_spark.io import read_table
    out = SK.bloom_chunk_probe(read_table(spark, sf_dir, "documents"))
    rows = out.collect()
    assert rows, "delta batch must be non-empty"
    for r in rows:
        assert r["n_bloom_hit"] >= r["n_exact_dup"], r
        assert r["n_false_pos"] == r["n_bloom_hit"] - r["n_exact_dup"], r
        assert 0 <= r["n_bloom_hit"] <= r["n_chunks"], r


def test_bloom_detects_planted_duplicate(spark):
    """A delta doc (id 4) that byte-duplicates a corpus doc (id 0)
    must come back all-hit, all-exact, zero false positives."""
    text = " ".join(f"w{i}" for i in range(40))
    other = " ".join(f"q{i}" for i in range(40))
    docs = docs_df(spark, [text, other, other, other, text])
    got = {r["doc_id"]: r for r in SK.bloom_chunk_probe(docs).collect()}
    assert set(got) == {4}
    r = got[4]
    assert r["n_exact_dup"] == r["n_chunks"] == r["n_bloom_hit"]
    assert r["n_false_pos"] == 0


def test_bloom_fresh_delta_mostly_misses(spark):
    """A delta doc sharing nothing with the corpus: exact dups are 0
    by construction; bloom hits can only be (rare) false positives."""
    docs = docs_df(spark, [" ".join(f"a{i}" for i in range(40)),
                           "b", "c", "d",
                           " ".join(f"z{i}" for i in range(40))])
    r = SK.bloom_chunk_probe(docs).collect()
    assert len(r) == 1 and r[0]["n_exact_dup"] == 0
    assert r[0]["n_false_pos"] == r[0]["n_bloom_hit"]


# -- winsorized_stats --------------------------------------------------

def test_winsorized_hand_computed(spark):
    """10 docs, one huge outlier: p10/p90 are the rank-1 and rank-9
    values, the winsorized mean clips the outlier to p90, the trimmed
    mean drops ranks ≤1 and >9."""
    lengths = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100000]
    texts = ["x" * n for n in lengths]
    out = TX.winsorized_stats(docs_df(spark, texts)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 10
    assert r["p10_chars"] == 10 and r["p90_chars"] == 90
    # winsorized: 1*10 + (20+..+90) + 1*90
    w = (1 * 10 + sum(lengths[1:9]) + 1 * 90) / 10
    assert r["winsorized_mean"] == round(w, 6)
    assert r["trimmed_mean"] == round(sum(lengths[1:9]) / 8, 6)
    assert r["mean_chars"] == round(sum(lengths) / 10, 6)


def test_winsorized_outlier_immunity(spark):
    """Growing the outlier 100× moves the mean but NOT the
    winsorized or trimmed statistics."""
    base = [10, 20, 30, 40, 50, 60, 70, 80, 90]
    a = TX.winsorized_stats(
        docs_df(spark, ["x" * n for n in base + [1000]])).collect()[0]
    b = TX.winsorized_stats(
        docs_df(spark, ["x" * n for n in base + [100000]])).collect()[0]
    assert a["winsorized_mean"] == b["winsorized_mean"]
    assert a["trimmed_mean"] == b["trimmed_mean"]
    assert a["mean_chars"] != b["mean_chars"]


def test_winsorized_single_doc_source(spark):
    """n=1: lo=hi=1 → p10=p90=v, winsorized mean = v, trimmed NULL."""
    r = TX.winsorized_stats(docs_df(spark, ["hello"])).collect()[0]
    assert r["p10_chars"] == r["p90_chars"] == 5
    assert r["winsorized_mean"] == 5.0
    assert r["trimmed_mean"] is None


# -- ivf_balance_report ------------------------------------------------

def test_ivf_balance_shares_sum_to_one(spark, sf_dir):
    from etl_portfolio_tracker_spark.io import read_table
    rows = SIM.ivf_balance_report(
        read_table(spark, sf_dir, "embeddings")).collect()
    assert rows
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    tot = sum(r["n_vecs"] for r in rows)
    for r in rows:
        assert r["load_factor"] == round(
            r["n_vecs"] * SIM.N_IVF_CELLS / tot, 6)
    # ordered by occupancy desc
    occ = [r["n_vecs"] for r in rows]
    assert occ == sorted(occ, reverse=True)


def test_ivf_balance_matches_assignment_counts(spark, sf_dir):
    from etl_portfolio_tracker_spark.io import read_table
    emb = read_table(spark, sf_dir, "embeddings")
    counts = {r["cell"]: r["count"]
              for r in SIM.ivf_assign(emb).groupBy("cell").count().collect()}
    rep = {r["cell"]: r["n_vecs"]
           for r in SIM.ivf_balance_report(emb).collect()}
    assert rep == counts


# -- streaming_hll_replay ----------------------------------------------

def test_streaming_hll_matches_batch(spark, sf_dir):
    """The streamed register table must roll up to the exact same
    frame as the batch operator (shared rollup, shared oracle)."""
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.streaming.replay import (
        streaming_hll_replay)
    batch = SK.hll_distinct(read_table(spark, sf_dir, "events")).collect()
    stream = streaming_hll_replay(spark, sf_dir).collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


# -- join_size_estimate ------------------------------------------------

def test_ams_estimate_accuracy(spark, sf_dir):
    """AMS median-of-5 estimate lands within the √(2/w) ≈ 4.4%
    band scaled by a safety factor; exact F2 equals the true
    self-join row count computed independently."""
    from etl_portfolio_tracker_spark.io import read_table
    li = read_table(spark, sf_dir, "lineitem")
    r = SK.join_size_estimate(li).collect()[0]
    a = li.select("l_orderkey", "l_partkey").alias("a")
    b = li.select("l_partkey").alias("b")
    true = a.join(b, "l_partkey").count()
    assert r["true_selfjoin"] == true
    assert abs(r["rel_error"]) < 0.25  # 5× the one-row std
    assert r["overestimate"] == r["ams_estimate"] - r["true_selfjoin"]


def test_ams_exact_on_distinct_keys(spark):
    """All-distinct keys: F2 = n. The signed counters can still
    collide, but with n << w the estimate is n exactly for this
    fixed corpus (collision would show as a deviation)."""
    li = docs_df(spark, ["x"]).sparkSession.createDataFrame(
        [(i, i) for i in range(30)], "l_orderkey long, l_partkey long")
    r = SK.join_size_estimate(li).collect()[0]
    assert r["true_selfjoin"] == 30
    # median row is robust to a single colliding pair; exactness of
    # the chosen realization is pinned (deterministic hash, fixed data)
    assert r["ams_estimate"] == 30


# -- streaming_bloom_probe_replay ---------------------------------------

def test_streaming_bloom_matches_batch(spark, sf_dir):
    """The streamed in-row probe must roll up to the exact same frame
    as the batch join formulation (same filter, same oracle)."""
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.streaming.replay import (
        streaming_bloom_probe_replay)
    batch = SK.bloom_chunk_probe(
        read_table(spark, sf_dir, "documents")).collect()
    stream = streaming_bloom_probe_replay(spark, sf_dir).collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


# -- hll_set_ops --------------------------------------------------------

def test_hll_union_equals_combined_group(spark):
    """Register-max merge must give EXACTLY the estimate of a group
    that contains the union's keys: type 'c' holds every user of 'a'
    and 'b', so union_est(a,b) == raw_estimate(c)."""
    rows = (_ev_rows(12, "a")
            + [(i + 1000, ts, u + 500, et, v)
               for (i, ts, u, et, v) in _ev_rows(18, "b")])
    both = rows + [(i + 5000, ts, u, "c", v) for (i, ts, u, et, v) in rows]
    ev = events_df(spark, both)
    u = {(r["type_a"], r["type_b"]): r for r in SK.hll_set_ops(ev).collect()}
    c = {r["event_type"]: r for r in SK.hll_distinct(ev).collect()}
    assert u[("a", "b")]["union_est"] == c["c"]["raw_estimate"]
    assert u[("a", "b")]["exact_union"] == 30
    assert u[("a", "b")]["exact_inter"] == 0


def test_hll_identical_groups_union_is_group(spark):
    """A ∪ A' where A' duplicates A's users: union estimate equals
    the single-group estimate and inclusion-exclusion intersection
    equals it too (est_a + est_b − est_union = est_a)."""
    rows = _ev_rows(20, "a") + [
        (i + 9000, ts, u, "b", v) for (i, ts, u, et, v) in _ev_rows(20, "a")]
    ev = events_df(spark, rows)
    u = SK.hll_set_ops(ev).collect()[0]
    g = SK.hll_distinct(ev).collect()[0]
    assert u["union_est"] == g["raw_estimate"]
    assert u["inter_est"] == u["union_est"]
    assert u["exact_inter"] == u["exact_union"] == 20


# -- streaming_cms_replay ------------------------------------------------

def test_streaming_cms_matches_batch(spark, sf_dir):
    """The streamed counter grid must probe to the exact same frame
    as the batch operator (shared probe, shared oracle)."""
    from etl_portfolio_tracker_spark.io import read_table
    from etl_portfolio_tracker_spark.streaming.replay import (
        streaming_cms_replay)
    batch = SK.cms_heavy_hitters(
        read_table(spark, sf_dir, "documents")).collect()
    stream = streaming_cms_replay(spark, sf_dir).collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


# -- histogram_quantiles -------------------------------------------------

def _li(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "l_orderkey long, l_extendedprice double")


def test_histogram_quantiles_exact_columns(spark):
    """Target ranks and exact order statistics are integer-exact; the
    estimate sits inside the bucket that contains the true value."""
    vals = list(range(1, 101))  # 1..100
    rows = {r["q"]: r for r in
            SK.histogram_quantiles(_li(spark, vals)).collect()}
    assert set(rows) == set(SK.HIST_QS)
    for q, r in rows.items():
        assert r["target_rank"] == (100 * q + 99) // 100
        assert r["exact_value"] == float(r["target_rank"])
        # 64 buckets over [1,100]: width ~1.55 → estimate within one
        # bucket of the exact value
        assert abs(r["est_value"] - r["exact_value"]) <= (99 / 64) + 1e-9


def test_histogram_quantiles_matches_python(spark):
    """Estimate equals an independent Python implementation of the
    same fixed-boundary interpolation."""
    vals = [3.5, 7.25, 7.25, 10.0, 55.125, 90.0, 91.5, 100.0]
    rows = {r["q"]: r for r in
            SK.histogram_quantiles(_li(spark, vals)).collect()}
    lo, hi, n = min(vals), max(vals), len(vals)
    w = (hi - lo) / SK.HIST_BUCKETS
    import collections
    cnts = collections.Counter(
        min(int((v - lo) / w), SK.HIST_BUCKETS - 1) for v in vals)
    for q in SK.HIST_QS:
        t = (n * q + 99) // 100
        cum = 0
        for b in sorted(cnts):
            if cum + cnts[b] >= t:
                est = lo + w * (b + (t - cum) / cnts[b])
                break
            cum += cnts[b]
        r = rows[q]
        # Spark/DuckDB ROUND are half-away-from-zero; Python round()
        # is banker's — emulate the engines' mode for the reference
        from decimal import Decimal, ROUND_HALF_UP
        expect = float(Decimal(repr(est)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP))
        assert r["est_value"] == expect
        assert r["exact_value"] == sorted(vals)[t - 1]


def test_histogram_quantiles_constant_column(spark):
    """All-equal values: every estimate collapses into bucket 0 and
    the exact value; no division blow-up."""
    rows = SK.histogram_quantiles(_li(spark, [42.0] * 10)).collect()
    for r in rows:
        assert r["exact_value"] == 42.0
        assert abs(r["est_value"] - 42.0) < 1e-9

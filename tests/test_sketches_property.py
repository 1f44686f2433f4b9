"""Property tests for the sketch tier: the sketch CONTRACTS
(one-sided error, no false negatives, exact reconstruction against an
independent pure-Python implementation) must hold for ARBITRARY
inputs, not just the fixtures. One Spark job per hypothesis example;
example counts kept small because each example is a full job."""

import hashlib
from collections import Counter

from hypothesis import given, settings, strategies as st

from etl_portfolio_tracker_spark import schemas
from etl_portfolio_tracker_spark.operators import sketches as SK

import datetime as dt


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _events(spark, user_ids):
    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=i), int(u), "e", 1.0, "{}")
         for i, u in enumerate(user_ids)],
        schema="event_id long, ts timestamp_ntz, user_id long, "
               "event_type string, value double, props string")


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", f"s{i % 2}", len(t)) for i, t in enumerate(texts)],
        schema=schemas.DOCUMENTS)


WORDS = st.sampled_from(["a", "bb", "ccc", "dd", "e", "zz", "qq"])
DOC = st.lists(WORDS, min_size=1, max_size=30).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=60))
def test_hll_matches_pure_python(spark, user_ids):
    """Spark's register table and raw estimate equal an independent
    Python HLL over the identical hash — for any multiset of keys."""
    out = SK.hll_distinct(_events(spark, user_ids)).collect()[0]
    regs = {}
    for u in set(user_ids):
        h = _h32(str(u))
        reg, w = h % SK.HLL_M, h // SK.HLL_M
        rho = SK.HLL_RHO_MAX if w == 0 else SK.HLL_RHO_MAX - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    s = sum(2.0 ** -r for r in regs.values()) + (SK.HLL_M - len(regs))
    assert out["v_zero"] == SK.HLL_M - len(regs)
    assert out["raw_estimate"] == round(SK.HLL_ALPHA_M2 / s, 6)
    assert out["exact_distinct"] == len(set(user_ids))


@settings(max_examples=8, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=6))
def test_cms_one_sided_error(spark, texts):
    """Count-min NEVER underestimates, and each estimate equals the
    true count plus exactly the colliding mass (cross-checked with a
    pure-Python sketch over the same hash)."""
    rows = SK.cms_heavy_hitters(_docs(spark, texts)).collect()
    toks = [t for x in texts for t in x.split(" ") if t]
    c = Counter(toks)
    grid = Counter()
    for t, n in c.items():
        for i in range(SK.CMS_D):
            grid[(i, _h32(f"{i}:{t}") % SK.CMS_W)] += n
    for r in rows:
        assert r["true_count"] == c[r["token"]]
        expect = min(grid[(i, _h32(f"{i}:{r['token']}") % SK.CMS_W)]
                     for i in range(SK.CMS_D))
        assert r["cms_estimate"] == expect
        assert r["overestimate"] >= 0


@settings(max_examples=8, deadline=None)
@given(st.lists(DOC, min_size=5, max_size=10))
def test_bloom_never_false_negative(spark, texts):
    """For arbitrary corpora: every exact-duplicate delta chunk is a
    bloom hit (n_false_pos is exactly the surplus)."""
    rows = SK.bloom_chunk_probe(_docs(spark, texts)).collect()
    for r in rows:
        assert r["n_bloom_hit"] >= r["n_exact_dup"]
        assert r["n_false_pos"] == r["n_bloom_hit"] - r["n_exact_dup"]
        assert 0 <= r["n_bloom_hit"] <= r["n_chunks"]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50),
                min_size=1, max_size=80))
def test_ams_matches_pure_python(spark, keys):
    """The AMS median-of-5 estimate equals an independent Python
    count-sketch over the same hash, and true F2 equals Σ n²."""
    li = spark.createDataFrame(
        [(i, int(k)) for i, k in enumerate(keys)],
        "l_orderkey long, l_partkey long")
    r = SK.join_size_estimate(li).collect()[0]
    c = Counter(keys)
    assert r["true_selfjoin"] == sum(n * n for n in c.values())
    ests = []
    for i in range(SK.AMS_D):
        counters = Counter()
        for k, n in c.items():
            h = _h32(f"{i}~{k}")
            sign = 1 if (h // SK.AMS_W) % 2 == 0 else -1
            counters[h % SK.AMS_W] += sign * n
        ests.append(sum(v * v for v in counters.values()))
    ests.sort()
    assert r["ams_estimate"] == ests[SK.AMS_D // 2]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=5000),
                min_size=1, max_size=40))
def test_winsorized_matches_pure_python(spark, lengths):
    """Order statistics, winsorized and trimmed means equal an
    independent Python computation for arbitrary length multisets
    (single source, so ranks are global)."""
    from etl_portfolio_tracker_spark.operators import text as TX
    docs = spark.createDataFrame(
        [(i, "x" * n, "en", "s", n) for i, n in enumerate(lengths)],
        schema=schemas.DOCUMENTS)
    r = TX.winsorized_stats(docs).collect()[0]
    v = sorted(lengths)          # ties: doc_id tiebreak never changes
    n = len(v)                   # the VALUE at a rank
    lo = (n * 10 + 99) // 100
    hi = (n * 90 + 99) // 100
    p10, p90 = v[lo - 1], v[hi - 1]
    assert (r["n_docs"], r["p10_chars"], r["p90_chars"]) == (n, p10, p90)
    assert r["mean_chars"] == round(sum(v) / n, 6)
    wsum = lo * p10 + sum(v[lo:hi]) + (n - hi) * p90
    assert r["winsorized_mean"] == round(wsum / n, 6)
    if hi > lo:
        assert r["trimmed_mean"] == round(sum(v[lo:hi]) / (hi - lo), 6)
    else:
        assert r["trimmed_mean"] is None

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

"""Financial time-series analytics over the price/trade tables —
the natural extension tier of the reference's TWR dashboard math
(1_Dashboard.py:302-356): rolling volatility, drawdown, EMA, VWAP,
rolling beta, and a pairwise return-correlation matrix.

All of these are window/agg compositions — zero UDFs, zero collects.
Float-determinism recipe (derive.py docstring): per-row math in
DOUBLE; every emitted SUM goes through DECIMAL(38,10) so Spark's
parallel partial aggregation and DuckDB's sequential fold agree
bit-for-bit; moment formulas (variance / covariance / correlation /
beta) are then evaluated in DOUBLE from those exact sums with the
same expression shape on both sides.

Scale posture:
  * rolling windows partition by ticker — one shuffle, then each
    ticker's series folds independently; no per-key state leaves the
    executor.
  * `rolling_beta` broadcasts the single benchmark series into every
    ticker partition instead of shuffling the fact side twice.
  * `corr_matrix` is O(k²) in ticker count by construction — callers
    bound k (the query uses the 5 event tickers). At 100 TB the
    shape stays: the pair grid is a driver-sized dimension, the
    per-pair moments are one decimal-sum aggregation over the
    date-joined returns.
  * `ema` folds each ticker's ordered series inside one
    `aggregate()` expression (JVM-side, no Python); the collected
    array is bounded by days-per-ticker, the same bound the
    reference's pandas pivot already assumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..derive import DEC, dsum
from .windowed import daily_returns


def _returns(tick_prices: DataFrame) -> DataFrame:
    """ticker, ts, ret — first row of each ticker defined as ret=0
    (pct_change().fillna(0), 1_Dashboard.py:312)."""
    return daily_returns(tick_prices).select("ticker", "ts", "ret")


def rolling_volatility(tick_prices: DataFrame, n: int = 20) -> DataFrame:
    """Trailing-n sample stddev of daily returns per ticker.

    Variance from exact decimal window-sums:
        var = (Σr² − (Σr)²/cnt) / (cnt−1)
    evaluated in DOUBLE from the decimal sums — both engines compute
    the identical expression on identical inputs.
    """
    r = _returns(tick_prices)
    w = (W.partitionBy("ticker").orderBy("ts")
         .rowsBetween(-(n - 1), W.currentRow))
    sr = F.sum(F.col("ret").cast(DEC)).over(w).cast("double")
    sr2 = F.sum((F.col("ret") * F.col("ret")).cast(DEC)).over(w).cast("double")
    cnt = F.count("ret").over(w).cast("double")
    var = (sr2 - sr * sr / cnt) / (cnt - 1)
    return r.select(
        "ticker", "ts", "ret",
        F.when(cnt >= 2, F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6))
         .alias("vol"))


def drawdown(tick_prices: DataFrame) -> DataFrame:
    """Running-peak drawdown per ticker: dd = close/cummax(close) − 1.
    cummax is exact (no accumulation), so no decimal detour needed."""
    w = (W.partitionBy("ticker").orderBy("ts")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    peak = F.max("close").over(w)
    return tick_prices.select(
        "ticker", "ts", "close",
        peak.alias("peak"),
        F.round(F.col("close") / peak - 1, 6).alias("dd"))


def max_drawdown(tick_prices: DataFrame) -> DataFrame:
    """Worst drawdown per ticker — MIN over the drawdown series
    (order-insensitive, exact)."""
    dd = drawdown(tick_prices)
    return (dd.groupBy("ticker")
            .agg(F.min("dd").alias("max_dd"),
                 F.count(F.lit(1)).alias("n_obs"))
            .orderBy("ticker"))


EMA_MAX_OBS = 100_000  # per-ticker history bound (~400 years of
# daily bars): the collect_list array is in-row state, so its size
# must be explicitly bounded like every other array kernel here
# (minhash signatures ≤ K, shingle sets candidate-restricted, …).
# A feed that violates the bound fails LOUDLY instead of silently
# building an executor-OOM-sized row.


def ema_final(tick_prices: DataFrame, alpha: float = 0.2,
              max_obs: int = EMA_MAX_OBS) -> DataFrame:
    """Final EMA of close per ticker: the classic recursive smoother
        ema_t = α·x_t + (1−α)·ema_{t−1},  seeded with x_1.

    A recursion has no closed window-function form, but it IS a left
    fold — Spark's `aggregate()` higher-order function runs it
    JVM-side over the ticker's ordered close array (DuckDB twin:
    `list_reduce(list(close ORDER BY ts), ...)`, which seeds with the
    first element the same way). Identical fold order + identical
    per-step DOUBLE arithmetic → bit-equal results.

    The per-ticker array is bounded by `max_obs` (domain: one row per
    trading day per ticker, so ~250/year — the default bound is two
    orders of magnitude of headroom); a violating key raises at
    execution rather than ballooning a single row. For series that
    genuinely exceed the bound, chunk the fold: EMA is associative
    over segments via (w, v) = (Π(1−α), folded value) composition.
    """
    a = float(alpha)
    arr = F.array_sort(F.collect_list(F.struct("ts", "close")))
    closes = F.transform(F.col("_arr"), lambda s: s["close"])
    fold = F.aggregate(
        F.slice(closes, 2, F.greatest(F.size(closes) - 1, F.lit(0))),
        F.element_at(closes, 1),
        lambda acc, x: F.lit(a) * x + F.lit(1.0 - a) * acc)
    # assert_true yields NULL when the bound holds; the filter keeps
    # every row while forcing evaluation (a dropped column would be
    # pruned by Catalyst and never checked).
    guard = F.assert_true(
        F.size("_arr") <= max_obs,
        F.lit(f"ema_final: per-ticker history exceeds {max_obs} rows"))
    return (tick_prices.groupBy("ticker")
            .agg(arr.alias("_arr"))
            .filter(guard.isNull())
            .select("ticker",
                    F.size("_arr").alias("n_obs"),
                    F.round(fold, 6).alias("ema"))
            .orderBy("ticker"))


def vwap(trades: DataFrame) -> DataFrame:
    """Volume-weighted average price per (ticker, day):
    Σ(price·qty)/Σ(qty), both sums exact decimals, division in
    DOUBLE."""
    return (trades
            .groupBy("ticker", F.to_date("ts").alias("d"))
            .agg(dsum(F.col("price") * F.col("qty")).alias("pv"),
                 dsum(F.col("qty")).alias("v"))
            .select("ticker", "d",
                    F.round(F.col("pv").cast("double")
                            / F.col("v").cast("double"), 6).alias("vwap"),
                    F.col("v").cast("double").alias("volume")))


def rolling_beta(tick_prices: DataFrame, benchmark: str,
                 n: int = 20) -> DataFrame:
    """Trailing-n beta of each ticker's returns vs one benchmark
    ticker:  β = (cnt·Σxy − Σx·Σy) / (cnt·Σx² − (Σx)²)   [x = bench]

    The benchmark series is tiny (one ticker) → broadcast into every
    ticker partition; the fact side shuffles once for the window.
    """
    r = _returns(tick_prices)
    bench = (r.filter(F.col("ticker") == benchmark)
             .select(F.col("ts").alias("b_ts"),
                     F.col("ret").alias("bench_ret")))
    joined = (r.join(F.broadcast(bench), r.ts == bench.b_ts, "inner")
              .select("ticker", "ts", "ret", "bench_ret"))
    w = (W.partitionBy("ticker").orderBy("ts")
         .rowsBetween(-(n - 1), W.currentRow))
    sx = F.sum(F.col("bench_ret").cast(DEC)).over(w).cast("double")
    sy = F.sum(F.col("ret").cast(DEC)).over(w).cast("double")
    sxy = F.sum((F.col("bench_ret") * F.col("ret")).cast(DEC)) \
           .over(w).cast("double")
    sxx = F.sum((F.col("bench_ret") * F.col("bench_ret")).cast(DEC)) \
           .over(w).cast("double")
    cnt = F.count("ret").over(w).cast("double")
    denom = cnt * sxx - sx * sx
    beta = F.when((cnt >= 2) & (denom != 0),
                  F.round((cnt * sxy - sx * sy) / denom, 6))
    return joined.select("ticker", "ts", beta.alias("beta"))


def corr_matrix(tick_prices: DataFrame) -> DataFrame:
    """Pairwise Pearson correlation of daily returns between every
    ticker pair (t1 < t2) over their common dates.

        ρ = (cnt·Σxy − Σx·Σy) /
            sqrt((cnt·Σx² − (Σx)²) · (cnt·Σy² − (Σy)²))

    Self-join on date, one decimal-sum aggregation per pair. Pair
    count is O(k²) in tickers — the caller bounds k; the date join
    is the only data-sized operation.
    """
    r1 = _returns(tick_prices)
    r2 = (r1.select(F.col("ticker").alias("t2"),
                    F.col("ts").alias("ts2"),
                    F.col("ret").alias("ret2")))
    j = (r1.join(r2, (r1.ts == r2.ts2) & (r1.ticker < r2.t2), "inner")
         .select(F.col("ticker").alias("t1"), "t2",
                 F.col("ret").alias("x"), F.col("ret2").alias("y")))
    agg = (j.groupBy("t1", "t2")
           .agg(F.count(F.lit(1)).cast("double").alias("cnt"),
                dsum(F.col("x")).cast("double").alias("sx"),
                dsum(F.col("y")).cast("double").alias("sy"),
                dsum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
                dsum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
                dsum(F.col("y") * F.col("y")).cast("double").alias("syy")))
    vx = F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("cnt") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when((F.col("cnt") >= 2) & (vx > 0) & (vy > 0),
                  F.round((F.col("cnt") * F.col("sxy")
                           - F.col("sx") * F.col("sy"))
                          / F.sqrt(vx * vy), 6))
    return (agg.select("t1", "t2", F.col("cnt").cast("bigint").alias("n_obs"),
                       corr.alias("corr"))
            .orderBy("t1", "t2"))


def range_window_avg(prices: DataFrame, days: int = 7) -> DataFrame:
    """Trailing `days`-day average close per ticker over a SPARSE
    series — a RANGE frame keyed on calendar distance, not row count
    (a ROWS frame silently widens its time span wherever dates are
    missing; this one is exact over gaps).

    Spark needs a numeric range key: `unix_date` (days since epoch)
    makes the frame `RANGE BETWEEN days-1 PRECEDING AND CURRENT ROW`
    in day units — the exact twin of DuckDB's
    `RANGE BETWEEN INTERVAL n DAYS PRECEDING AND CURRENT ROW` over the
    DATE column. Same single ticker-shuffle as every window here.
    """
    w = (W.partitionBy("ticker").orderBy(F.unix_date(F.col("ts")))
         .rangeBetween(-(days - 1), W.currentRow))
    s = F.sum(F.col("close").cast(DEC)).over(w).cast("double")
    n = F.count("close").over(w)
    return prices.select(
        "ticker", "ts", "close",
        (s / n).alias("avg_7d"),
        n.alias("n_in_window"))


VAR_ALPHA_BP = 500   # 5% tail, in basis points of 10000


def hist_var(tick_prices: DataFrame,
             alpha_bp: int = VAR_ALPHA_BP) -> DataFrame:
    """Historical Value-at-Risk and Expected Shortfall per ticker:
    VaR = the alpha-quantile (discrete, lower) of daily returns, ES =
    the mean of returns at or below that rank — the loss-tail risk
    report a portfolio engine serves next to volatility.

    Exact rank arithmetic, no quantile function: k = ceil(alpha·n) in
    integer basis points, the k-th smallest return per ticker via a
    window row_number (ties broken by ts so the rank is total), VaR
    is that row's return, ES the exact-decimal mean of rows 1..k with
    ONE final IEEE division ROUNDed 6dp. percentile_approx (sketch)
    and engine quantile functions with differing interpolation rules
    never enter — both engines replay the identical integer-rank
    selection.

    Scale: one shuffle on ticker for the rank window; k rows per
    ticker feed the final aggregate."""
    r = _returns(tick_prices)
    w = W.partitionBy("ticker").orderBy("ret", "ts")
    cnt = W.partitionBy("ticker")
    ranked = r.select(
        "ticker", "ret",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(cnt).alias("_n"))
    k = F.expr(f"(_n * {alpha_bp} + 9999) div 10000")
    tail = ranked.withColumn("_k", k).filter(F.col("_rn") <= F.col("_k"))
    return (tail.groupBy("ticker")
            .agg(F.max("_n").cast("long").alias("n_days"),
                 F.max(F.when(F.col("_rn") == F.col("_k"), F.col("ret")))
                  .alias("var_tail"),
                 F.round(F.sum(F.col("ret").cast(DEC)).cast("double")
                         / F.count(F.lit(1)), 6).alias("es_tail"))
            .orderBy("ticker"))


def sharpe_rolling(tick_prices: DataFrame, n: int = 20) -> DataFrame:
    """Trailing-n annualized Sharpe ratio per ticker (zero risk-free
    rate): mean/stddev of daily returns over the same window kernel as
    rolling_volatility, scaled by √252 — the rolling risk-adjusted-
    return series every portfolio dashboard charts next to vol.

    Determinism follows rolling_volatility exactly: window mean and
    sample variance are evaluated in DOUBLE from exact DECIMAL window
    sums, so both engines compute the identical IEEE expression;
    sqrt(252.0) is correctly rounded, hence bit-identical.
    """
    r = _returns(tick_prices)
    w = (W.partitionBy("ticker").orderBy("ts")
         .rowsBetween(-(n - 1), W.currentRow))
    sr = F.sum(F.col("ret").cast(DEC)).over(w).cast("double")
    sr2 = F.sum((F.col("ret") * F.col("ret")).cast(DEC)).over(w).cast("double")
    cnt = F.count("ret").over(w).cast("double")
    mean = sr / cnt
    sd = F.sqrt(F.greatest((sr2 - sr * sr / cnt) / (cnt - 1), F.lit(0.0)))
    return r.select(
        "ticker", "ts", "ret",
        F.when((cnt >= 2) & (sd > 0),
               F.round(mean / sd * F.sqrt(F.lit(252.0)), 6))
         .alias("sharpe"))

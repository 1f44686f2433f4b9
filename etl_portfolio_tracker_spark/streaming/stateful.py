"""Stateful per-key streaming logic (SURVEY §2.12): the oversell guard
(P10, trades.py:51-54) and the running GAV fold (W6) as keyed state
machines via applyInPandasWithState.

Each (user, ticker) key holds O(1) state (qty, avg, realized); state
is partitioned across executors by key — the streaming twin of
operators/fold.py. Trades inside a micro-batch are folded in (ts, id)
order; state carries across batches, so the fold is incremental: a
ledger of any length costs O(new trades) per batch. That is also the
ledger-compaction answer for the batch fold's skewed-key hazard.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("qty", T.DoubleType()),
    T.StructField("avg_cost", T.DoubleType()),
    T.StructField("realized", T.DoubleType()),
])

OUT_SCHEMA = T.StructType([
    T.StructField("user", T.StringType()),
    T.StructField("ticker", T.StringType()),
    T.StructField("qty", T.DoubleType()),
    T.StructField("avg_cost", T.DoubleType()),
    T.StructField("realized", T.DoubleType()),
    T.StructField("n_rejected", T.LongType()),
])


def _fold_with_state(key, pdfs: Iterable[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        q, avg, realized = state.get
    else:
        q, avg, realized = 0.0, 0.0, 0.0
    rejected = 0
    # concat ALL chunks for the key, sort ONCE: key-grouped Arrow
    # chunks carry no global-order promise, so per-chunk sorting
    # could fold out-of-order chunks (see _ewma_with_state)
    parts = [p for p in pdfs if len(p)]
    if parts:
        pdf = (pd.concat(parts, ignore_index=True)
               .sort_values(["ts", "id"], kind="mergesort"))
        for side, qty, price, fee in zip(pdf["side"].values, pdf["qty"].values,
                                         pdf["price"].values, pdf["fee"].values):
            qty, price, fee = float(qty), float(price), float(fee)
            if side == "BUY":
                avg = (q * avg + qty * price + fee) / (q + qty)
                q = q + qty
            else:
                # oversell guard (P10): reject sells beyond held qty
                # (epsilon 1e-12, trades.py:53) instead of clamping
                if qty > q + 1e-12:
                    rejected += 1
                    continue
                realized = realized + (price - avg) * qty
                q = q - qty
    state.update((q, avg, realized))
    yield pd.DataFrame({"user": [key[0]], "ticker": [key[1]],
                        "qty": [q], "avg_cost": [avg],
                        "realized": [realized], "n_rejected": [rejected]})


def streaming_portfolio_state(trades_stream: DataFrame) -> DataFrame:
    """Continuously-maintained (qty, avg_cost, realized) per
    (user, ticker) with oversell rejection counting."""
    return (trades_stream
            .groupBy("user", "ticker")
            .applyInPandasWithState(
                _fold_with_state,
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


class PortfolioProcessor:
    """Spark 4 transformWithStateInPandas version of the same fold —
    the successor API to applyInPandasWithState: typed state variables
    (ValueState here; ListState/MapState available), explicit init/
    close lifecycle, timers, and a RocksDB-backed store, so state can
    exceed executor memory at cluster scale. Kept semantically
    identical to _fold_with_state (same GAV/oversell math, same
    (ts, id) fold order) so the two APIs are interchangeable.

    Defined lazily as a StatefulProcessor subclass via __init_subclass
    -free composition: importing pyspark.sql.streaming at module load
    is fine, but the class body stays minimal for pickling to workers.
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "portfolio", "qty double, avg_cost double, realized double")

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            q, avg, realized = self._state.get()
        else:
            q, avg, realized = 0.0, 0.0, 0.0
        rejected = 0
        parts = [p for p in rows if len(p)]
        if parts:
            pdf = (pd.concat(parts, ignore_index=True)
                   .sort_values(["ts", "id"], kind="mergesort"))
            for side, qty, price, fee in zip(
                    pdf["side"].values, pdf["qty"].values,
                    pdf["price"].values, pdf["fee"].values):
                qty, price, fee = float(qty), float(price), float(fee)
                if side == "BUY":
                    avg = (q * avg + qty * price + fee) / (q + qty)
                    q = q + qty
                else:
                    if qty > q + 1e-12:
                        rejected += 1
                        continue
                    realized = realized + (price - avg) * qty
                    q = q - qty
        self._state.update((q, avg, realized))
        yield pd.DataFrame({"user": [key[0]], "ticker": [key[1]],
                            "qty": [q], "avg_cost": [avg],
                            "realized": [realized], "n_rejected": [rejected]})

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def streaming_portfolio_tws(trades_stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of streaming_portfolio_state.
    Requires the RocksDB state store provider (set in tests) AND
    google.protobuf at runtime (the TWS Python worker's state-server
    protocol is protobuf-framed) — environments without it should use
    streaming_portfolio_state, which is wire-format-free and
    semantically identical.
    """
    from pyspark.sql.streaming import StatefulProcessor

    proc = type("PortfolioStatefulProcessor",
                (PortfolioProcessor, StatefulProcessor), {})()
    return (trades_stream
            .groupBy("user", "ticker")
            .transformWithStateInPandas(
                statefulProcessor=proc,
                outputStructType=OUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))


# --- streaming EWMA (the windowed.ewma_prices recursion as keyed
#     streaming state) --------------------------------------------------

EWMA_STATE_SCHEMA = T.StructType([
    T.StructField("ewma", T.DoubleType()),
    T.StructField("n", T.LongType()),
])

EWMA_OUT_SCHEMA = T.StructType([
    T.StructField("ticker", T.StringType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("ewma", T.DoubleType()),
])

EWMA_ALPHA = 0.25  # keep equal to windowed.EWMA_ALPHA (exact 2^-2)


def _ewma_with_state(key, pdfs: Iterable[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-ticker EWMA of event values in (ts, event_id) order:
    s_1 = x_1, s_t = alpha*x_t + (1-alpha)*s_{t-1}. O(1) state per
    key; incremental across micro-batches (a day's new events cost
    O(new events) — the streaming form of the fold-kernel EWMA)."""
    import numpy as np
    if state.exists:
        s, n = state.get
    else:
        s, n = 0.0, 0
    # Concatenate ALL of the key's chunks and sort ONCE: Spark's
    # key-grouping does not promise globally-ordered Arrow chunks, so
    # a per-chunk sort could fold chunks delivered out of order. Then
    # fold the whole sorted run through the C ewm kernel (adjust=False
    # IS the recursion s_t = a*x_t + (1-a)*s_{t-1}, bit-identical —
    # test_ewma_matches_pandas_ewm_bitwise); prior state seeds as a
    # synthetic x_0, the exact next fold step.
    parts = [p for p in pdfs if len(p)]
    if parts:
        pdf = (pd.concat(parts, ignore_index=True)
               .sort_values(["ts", "event_id"], kind="mergesort"))
        x = pdf["value"].to_numpy(dtype="float64")
        run = x if n == 0 else np.r_[s, x]
        s = float(pd.Series(run).ewm(alpha=EWMA_ALPHA,
                                     adjust=False).mean().iloc[-1])
        n += len(x)
    state.update((s, n))
    yield pd.DataFrame({"ticker": [key[0]], "n_events": [int(n)],
                        "ewma": [s]})


def streaming_ewma_state(events_stream: DataFrame) -> DataFrame:
    """Continuously-maintained per-ticker EWMA of event values."""
    from pyspark.sql import functions as F
    return (events_stream
            .select(F.col("event_type").alias("ticker"),
                    "ts", "event_id", "value")
            .groupBy("ticker")
            .applyInPandasWithState(
                _ewma_with_state,
                outputStructType=EWMA_OUT_SCHEMA,
                stateStructType=EWMA_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


# --- streaming Holt level+trend smoothing (windowed.holt_winters as
#     keyed per-ticker streaming state — r9; the trend-aware member
#     of the incremental smoothing family next to _ewma_with_state) --

HOLT_STATE_SCHEMA = T.StructType([
    T.StructField("level", T.DoubleType()),
    T.StructField("trend", T.DoubleType()),
    T.StructField("seeded", T.BooleanType()),
])

HOLT_OUT_SCHEMA = T.StructType([
    T.StructField("ticker", T.StringType()),
    T.StructField("ts", T.DateType()),
    T.StructField("close", T.DoubleType()),
    T.StructField("level", T.DoubleType()),
    T.StructField("trend", T.DoubleType()),
    T.StructField("forecast", T.DoubleType()),
])


def _holt_with_state(key, pdfs: Iterable[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-ticker Holt recursion (alpha=1/2, beta=1/4 — exact binary
    fractions) over daily close marks: l' = α·x + (1−α)·(l+b),
    b' = β·(l'−l) + (1−β)·b, forecast = l'+b'. State = (level,
    trend); a new day-batch costs O(days in the batch) with NO
    recompute of history. Bit-exact vs windowed.holt_winters: the
    same IEEE op tree per step, rounding only on emit
    (_spark_round, the repo's Spark-round mirror). Day-atomic,
    day-ascending batches assumed (the _twr_with_state contract)."""
    alpha, beta = 0.5, 0.25
    if state.exists:
        lv, tr, seeded = state.get
    else:
        lv, tr, seeded = 0.0, 0.0, False
    rows: dict[str, list] = {"ticker": [], "ts": [], "close": [],
                             "level": [], "trend": [], "forecast": []}
    parts = [p for p in pdfs if len(p)]
    if parts:
        pdf = (pd.concat(parts, ignore_index=True)
               .sort_values("ts", kind="mergesort"))
        for ts, x in zip(pdf["ts"].values, pdf["close"].values):
            x = float(x)
            if not seeded:
                lv, tr, seeded = x, 0.0, True
            else:
                l_new = alpha * x + (1 - alpha) * (lv + tr)
                tr = beta * (l_new - lv) + (1 - beta) * tr
                lv = l_new
            rows["ticker"].append(key[0])
            rows["ts"].append(ts)
            rows["close"].append(x)
            rows["level"].append(_spark_round(lv, "0.000001"))
            rows["trend"].append(_spark_round(tr, "0.000001"))
            rows["forecast"].append(_spark_round(lv + tr, "0.000001"))
    state.update((lv, tr, seeded))
    yield pd.DataFrame(rows)


def streaming_holt_state(panel_stream: DataFrame) -> DataFrame:
    """Continuously-maintained per-ticker Holt level/trend over a
    stream of (ticker, ts, close) daily marks."""
    return (panel_stream
            .groupBy("ticker")
            .applyInPandasWithState(
                _holt_with_state,
                outputStructType=HOLT_OUT_SCHEMA,
                stateStructType=HOLT_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


# --- streaming portfolio TWR (windowed.portfolio_twr as keyed
#     per-user streaming state — the incremental form of the
#     reference's periodic-ingest contract, README.md:33-34) ----------

TWR_STATE_SCHEMA = T.StructType([
    T.StructField("tickers", T.ArrayType(T.StringType())),
    T.StructField("qtys", T.ArrayType(T.DoubleType())),
    T.StructField("closes", T.ArrayType(T.DoubleType())),
    T.StructField("started", T.BooleanType()),
    T.StructField("dead", T.BooleanType()),
    T.StructField("logsum", T.DoubleType()),
])

TWR_OUT_SCHEMA = T.StructType([
    T.StructField("user", T.StringType()),
    T.StructField("d", T.DateType()),
    T.StructField("port_ret", T.DoubleType()),
    T.StructField("twr_idx", T.DoubleType()),
])


def _spark_round(x: float, exp: str) -> float:
    """Spark round(double, n): HALF_UP on the SHORTEST decimal repr —
    CPython's repr() IS the shortest round-trip repr (the repo's
    established mirror, see derive.py)."""
    from decimal import ROUND_HALF_UP, Decimal
    return float(Decimal(repr(x)).quantize(Decimal(exp),
                                           rounding=ROUND_HALF_UP))


def _twr_with_state(key, pdfs: Iterable[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-USER portfolio TWR over the daily (ticker, qty, close_i)
    marks stream — the O(last-day-marks) incremental state form of
    windowed.portfolio_twr (VERDICT r7 Next item 7):

      state = (last day's per-ticker (qty, close), started, dead,
               ln-sum of the index factors)
      per day: hv_t = prev_qty·prev_close  (skip tickers with no
               prev mark — the batch LAG's NULL row);
               ret_t = close/prev_close − 1 (0 when prev_close = 0);
               tot = Σ dec10(hv), num = Σ dec10(hv·ret)  (exact
               DECIMAL(38,10) quantization of each double term — the
               dsum convention, order-insensitive);
               started latches at the first day tot > 0 (the batch
               trim); pret = num/tot as ONE double divide (0 when
               tot = 0); a pret ≤ −1 day latches dead → index 0
               thereafter; else logsum += ln(1+pret) and
               idx = round6(exp(logsum)·100).

    Bit-exactness vs the batch/oracle: every step mirrors the batch
    expression tree — double products, shortest-repr HALF_UP decimal
    quantization (Decimal(repr(x)), matching Spark's
    BigDecimal(Double.toString) cast), exact decimal sums, one
    decimal→double conversion per side (correctly rounded in both
    runtimes), libm ln/exp, and the same day-ascending ln summation
    order as the batch's cumulative window.

    Incrementality: a new day-batch costs O(marks in the batch); the
    state never grows beyond the user's ticker universe. Day-atomic
    batches are assumed (the daily-ingest contract — a day split
    across micro-batches would fold a partial day's marks as a full
    day)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    q10 = Decimal("1e-10")

    def dec10(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(q10, rounding=ROUND_HALF_UP)

    if state.exists:
        tickers, qtys, closes, started, dead, logsum = state.get
        prev = {t: (q, c) for t, q, c in zip(tickers, qtys, closes)}
    else:
        prev, started, dead, logsum = {}, False, False, 0.0
    rows: dict[str, list] = {"user": [], "d": [], "port_ret": [],
                             "twr_idx": []}
    parts = [p for p in pdfs if len(p)]
    if parts:
        # concat ALL chunks, sort ONCE (the _ewma_with_state rule)
        pdf = (pd.concat(parts, ignore_index=True)
               .sort_values(["ts", "ticker"], kind="mergesort"))
        for d, day in pdf.groupby("ts", sort=True):
            tot, num = Decimal(0), Decimal(0)
            cur: dict = {}
            for tkr, q, c in zip(day["ticker"].values, day["qty"].values,
                                 day["close_i"].values):
                q, c = float(q), float(c)
                cur[tkr] = (q, c)
                pqc = prev.get(tkr)
                if pqc is None:
                    continue                     # batch LAG NULL row
                pq, pc = pqc
                hv = pq * pc
                ret = 0.0 if pc == 0 else c / pc - 1
                tot += dec10(hv)
                num += dec10(hv * ret)
            prev = cur
            if not started:
                if tot > 0:
                    started = True               # the batch fh trim
                else:
                    continue
            pret = 0.0 if tot == 0 else float(num) / float(tot)
            if dead or pret <= -1:
                dead = True
                idx = 0.0
            else:
                logsum += math.log(1.0 + pret)
                idx = _spark_round(math.exp(logsum) * 100, "0.000001")
            rows["user"].append(key[0])
            rows["d"].append(d)
            rows["port_ret"].append(_spark_round(pret, "0.000001"))
            rows["twr_idx"].append(idx)
    state.update((list(prev), [v[0] for v in prev.values()],
                  [v[1] for v in prev.values()], started, dead, logsum))
    yield pd.DataFrame(rows)


def streaming_twr_state(panel_stream: DataFrame) -> DataFrame:
    """Continuously-maintained per-user portfolio TWR index over a
    stream of daily panel marks (user, ticker, ts, qty, close_i)."""
    return (panel_stream
            .groupBy("user")
            .applyInPandasWithState(
                _twr_with_state,
                outputStructType=TWR_OUT_SCHEMA,
                stateStructType=TWR_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))

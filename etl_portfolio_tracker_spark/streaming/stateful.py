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

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
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "id"], kind="mergesort")
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

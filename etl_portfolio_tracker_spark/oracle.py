"""DuckDB SQL twins of derive.py — shared CTE snippets prepended to
every oracle query in `__spark_entry__.py::oracle_sql()`.

These run ONLY in DuckDB (the driver registers the harness parquet
files as views named region/nation/.../embeddings), so DuckDB dialect
is fine.  They must stay semantically identical to derive.py.
"""

PRICES_CTE = """
prices AS (
    SELECT 'P' || l_partkey AS ticker,
           CAST(l_shipdate AS DATE) AS ts,
           MIN(l_extendedprice) AS close
    FROM lineitem
    GROUP BY 1, 2
)
"""

TRADES_CTE = """
trades AS (
    SELECT event_id AS id,
           'u' || user_id AS "user",
           event_type AS ticker,
           ts,
           CASE WHEN event_id % 3 = 0 THEN 'SELL' ELSE 'BUY' END AS side,
           1.0 + CAST(event_id % 10 AS DOUBLE) AS qty,
           ABS(value) + 1.0 AS price,
           CAST(event_id % 5 AS DOUBLE) * 0.25 AS fee
    FROM events
)
"""

TICK_PRICES_CTE = """
tick_prices AS (
    SELECT event_type AS ticker,
           CAST(ts AS DATE) AS ts,
           MIN(value) AS close
    FROM events
    GROUP BY 1, 2
)
"""

RAW_TRADES_CTE = """
raw_trades AS (
    SELECT event_id AS id,
           CASE WHEN user_id % 50 = 0 THEN '' ELSE 'u' || user_id END AS "user",
           event_type AS ticker,
           ts,
           CASE WHEN event_id % 3 = 0 THEN 'SELL'
                WHEN event_id % 3 = 1 THEN 'BUY'
                ELSE 'HOLD' END AS side,
           CAST(event_id % 10 AS DOUBLE) AS qty,
           value - 50.0 AS price,
           value - 100.0 AS fee
    FROM events
)
"""

# Recursive oversell guard (P10 batch form, trade_ops.reject_oversells):
# running held qty per (user, ticker) over accepted trades only.
OVERSELL_SQL = f"""
WITH RECURSIVE
{TRADES_CTE.strip().rstrip()},
tt AS (
    SELECT *, row_number() OVER (PARTITION BY "user", ticker ORDER BY ts, id) AS rn
    FROM trades
),
keys AS (SELECT "user", ticker, MAX(rn) AS n FROM tt GROUP BY 1, 2),
guard AS (
    SELECT "user", ticker, 0 AS rn, CAST(0.0 AS DOUBLE) AS held,
           CAST(NULL AS BIGINT) AS id, CAST(NULL AS BOOLEAN) AS accepted
    FROM keys
    UNION ALL
    SELECT g."user", g.ticker, t.rn,
           CASE WHEN t.side = 'BUY' THEN g.held + t.qty
                WHEN t.qty > g.held + 1e-12 THEN g.held
                ELSE g.held - t.qty END,
           t.id,
           CASE WHEN t.side = 'BUY' THEN TRUE
                WHEN t.qty > g.held + 1e-12 THEN FALSE
                ELSE TRUE END
    FROM guard g
    JOIN tt t ON t."user" = g."user" AND t.ticker = g.ticker AND t.rn = g.rn + 1
)
"""

UNIVERSE_CTE = """
universe AS (
    SELECT regexp_replace(trim(p_name), '\\s+', ' ', 'g') AS name_display,
           p_brand AS yf_symbol,
           p_type AS segment,
           lower(concat_ws(' ',
                 regexp_replace(trim(p_name), '\\s+', ' ', 'g'),
                 p_brand,
                 regexp_replace(p_brand, '\\.ST$', ''))) AS search_blob,
           regexp_replace(trim(p_name), '\\s+', ' ', 'g')
               || ' (' || p_brand || ')' AS display
    FROM part
)
"""


# Recursive-CTE twin of operators/fold.py (W6/W7): steps every
# (user, ticker) key through its trades in (ts, id) order, one
# recursion level per trade rank. Left-associated arithmetic matches
# the Python fold expression-for-expression so doubles are
# bit-identical.
FOLD_FINALS_SQL = f"""
WITH RECURSIVE
{TRADES_CTE.strip().rstrip()},
tt AS (
    SELECT *, row_number() OVER (PARTITION BY "user", ticker ORDER BY ts, id) AS rn
    FROM trades
),
keys AS (SELECT "user", ticker, MAX(rn) AS n FROM tt GROUP BY 1, 2),
fold AS (
    SELECT "user", ticker, 0 AS rn,
           CAST(0.0 AS DOUBLE) AS q, CAST(0.0 AS DOUBLE) AS avg,
           CAST(0.0 AS DOUBLE) AS realized
    FROM keys
    UNION ALL
    SELECT f."user", f.ticker, t.rn,
           CASE WHEN t.side = 'BUY' THEN f.q + t.qty
                WHEN f.q <= 0 THEN f.q
                ELSE f.q - LEAST(t.qty, f.q) END,
           CASE WHEN t.side = 'BUY'
                THEN (f.q * f.avg + t.qty * t.price + t.fee) / (f.q + t.qty)
                ELSE f.avg END,
           CASE WHEN t.side = 'SELL' AND f.q > 0
                THEN f.realized + (t.price - f.avg) * LEAST(t.qty, f.q)
                ELSE f.realized END
    FROM fold f
    JOIN tt t ON t."user" = f."user" AND t.ticker = f.ticker AND t.rn = f.rn + 1
),
finals AS (
    SELECT f."user", f.ticker, f.q AS qty, f.avg AS avg_cost, f.realized
    FROM fold f
    JOIN keys k ON k."user" = f."user" AND k.ticker = f.ticker AND f.rn = k.n
)
"""


# Recursive-CTE twin of streaming/stateful._fold_with_state: the
# STREAMING fold semantics — oversells are REJECTED (skipped and
# counted), not clamped like the batch fold. Same left-associated
# arithmetic as the Python fold, so doubles are bit-identical.
STREAM_FOLD_SQL = f"""
WITH RECURSIVE
{TRADES_CTE.strip().rstrip()},
tt AS (
    SELECT *, row_number() OVER (PARTITION BY "user", ticker ORDER BY ts, id) AS rn
    FROM trades
),
keys AS (SELECT "user", ticker, MAX(rn) AS n FROM tt GROUP BY 1, 2),
sfold AS (
    SELECT "user", ticker, 0 AS rn,
           CAST(0.0 AS DOUBLE) AS q, CAST(0.0 AS DOUBLE) AS avg,
           CAST(0.0 AS DOUBLE) AS realized, CAST(0 AS BIGINT) AS n_rej
    FROM keys
    UNION ALL
    SELECT f."user", f.ticker, t.rn,
           CASE WHEN t.side = 'BUY' THEN f.q + t.qty
                WHEN t.qty > f.q + 1e-12 THEN f.q
                ELSE f.q - t.qty END,
           CASE WHEN t.side = 'BUY'
                THEN (f.q * f.avg + t.qty * t.price + t.fee) / (f.q + t.qty)
                ELSE f.avg END,
           CASE WHEN t.side = 'SELL' AND t.qty <= f.q + 1e-12
                THEN f.realized + (t.price - f.avg) * t.qty
                ELSE f.realized END,
           f.n_rej + CASE WHEN t.side = 'SELL' AND t.qty > f.q + 1e-12
                          THEN 1 ELSE 0 END
    FROM sfold f
    JOIN tt t ON t."user" = f."user" AND t.ticker = f.ticker AND t.rn = f.rn + 1
),
sfinals AS (
    SELECT f."user", f.ticker, f.q AS qty, f.avg AS avg_cost,
           f.realized, f.n_rej AS n_rejected
    FROM sfold f
    JOIN keys k ON k."user" = f."user" AND k.ticker = f.ticker AND f.rn = k.n
)
"""


def with_domain(body: str, *ctes: str) -> str:
    """Wrap an oracle query body with the requested domain CTEs."""
    joined = ",\n".join(c.strip().rstrip() for c in ctes)
    return f"WITH {joined}\n{body}"

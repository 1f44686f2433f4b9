"""Harness-data smoke: every registered query runs against the REAL
driver parquet, and `read_table` returns the dtypes the operators
assume.

This is the gate that was missing in round 1: all event-family pytest
coverage built synthetic in-memory frames, so a schema drift in
events.parquet (TIMESTAMP(NANOS)-as-long → TIMESTAMP(MICROS,NTZ))
passed a fully green suite while 22 driver-checked queries errored at
read time (VERDICT r1 #1).  Reference behavior to match: SURVEY §5's
t2 gate — run on the harness data itself, not a stand-in.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from etl_portfolio_tracker_spark.io import read_table  # noqa: E402

# Column-name → dtype invariants the operator layer relies on.  `ts`
# must read as a (naive) timestamp, never a raw long; keys stay bigint.
EXPECTED_DTYPES = {
    "events": {"event_id": "bigint", "ts": ("timestamp", "timestamp_ntz"),
               "user_id": "bigint", "event_type": "string",
               "value": "double", "props": "string"},
    "documents": {"doc_id": "bigint", "text": "string"},
    "embeddings": {"vec_id": "bigint"},
    "lineitem": {"l_orderkey": "bigint", "l_quantity": "double"},
    "orders": {"o_orderkey": "bigint", "o_custkey": "bigint"},
    "customer": {"c_custkey": "bigint"},
    "part": {"p_partkey": "bigint"},
    "supplier": {"s_suppkey": "bigint"},
    "nation": {"n_nationkey": "int"},
    "region": {"r_regionkey": "int"},
}


@pytest.mark.parametrize("table", sorted(EXPECTED_DTYPES))
def test_read_table_dtypes(spark, sf_dir, table):
    dtypes = dict(read_table(spark, sf_dir, table).dtypes)
    for col, want in EXPECTED_DTYPES[table].items():
        assert col in dtypes, f"{table}.{col} missing (have {sorted(dtypes)})"
        want = want if isinstance(want, tuple) else (want,)
        assert dtypes[col] in want, (
            f"{table}.{col} reads as {dtypes[col]!r}, expected one of {want}")


def _query_names():
    return sorted(E.queries())


@pytest.mark.parametrize("name", _query_names())
def test_every_query_runs_on_harness_data(spark, sf_dir, name):
    """Analysis + one row of execution against the real sf0.001 parquet.

    `.limit(1).collect()` is enough to force full plan analysis (the
    class of failure that slipped through r1) without paying full
    execution for all ~90 queries.
    """
    df = E.queries()[name](spark, sf_dir)
    df.limit(1).collect()


def test_oracle_coverage_documented():
    """Every query either has an oracle or is a documented rows-only
    exception (iterative / sampling ops the driver checks weaker)."""
    rows_only_ok = {
        # kmeans_train graduated in r2: unrolled-Lloyd CTE oracle
        "approx_stats",  # sketch values engine-specific; bounds in pytest
        "audio_meta",    # RMS/peak over raw blob bytes — no portable
                         # DuckDB blob reduction; real WAV decode is
                         # pytest-verified on constructed payloads
    }
    missing = set(E.queries()) - set(E.oracle_sql()) - rows_only_ok
    assert not missing, f"queries with no oracle and no documented waiver: {sorted(missing)}"

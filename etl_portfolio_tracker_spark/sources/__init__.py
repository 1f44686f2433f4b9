"""Source/sink surface of the engine (SURVEY §2.1).

The batch scans and sinks live in `..io` (harness parquet tables, the
partitioned price layout, CSV securities master, idempotent append);
the streaming file source in `..streaming.ingest`; this package
re-exports them as the one place a user wires data in or out, and
adds the synthetic rate source (`rate.tick_stream`) — the
no-external-dependency stand-in for a live tick feed (the reference's
Yahoo poll, src/etl.py:24-43).
"""

from ..io import (  # noqa: F401
    idempotent_append,
    read_csv_universe,
    read_prices_range,
    read_table,
    write_prices_partitioned,
)
from ..streaming.ingest import (  # noqa: F401
    dedup_stream,
    read_price_stream,
    write_idempotent,
)
from .rate import tick_stream  # noqa: F401

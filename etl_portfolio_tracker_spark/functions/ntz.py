"""Timezone-independent NTZ arithmetic.

TIMESTAMP_NTZ must never round-trip through an LTZ instant:
`timestamp_micros()`/`unix_timestamp()` interpret or render in the
SESSION timezone, so under a non-UTC driver session every derived
timestamp shifts (found the hard way — see tools/check.py CHECK_TZ).
All epoch math therefore anchors to the *naive* 1970 epoch via
calendar arithmetic, which no session setting can influence.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_EPOCH = F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")


def ntz_from_micros(micros: Column) -> Column:
    """micros-since-epoch (long) → TIMESTAMP_NTZ."""
    return F.timestamp_add("MICROSECOND", micros, _EPOCH)


def ntz_epoch_seconds(ts: Column) -> Column:
    """TIMESTAMP_NTZ → whole seconds since the naive epoch (long)."""
    return F.timestamp_diff("SECOND", _EPOCH, ts)


def ntz_from_seconds(secs: Column) -> Column:
    """seconds-since-epoch (long) → TIMESTAMP_NTZ."""
    return F.timestamp_add("SECOND", secs, _EPOCH)

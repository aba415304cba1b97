"""NTZ-tolerant epoch-microsecond arithmetic.

The engine's event-time convention is TimestampType (LTZ) under a UTC
session timezone, and ``read_table`` enforces it at the scan.  But the
event-time operators (sessionize, as-of tolerance, interval join) accept
DataFrames from ANY source — a caller's own ``spark.read.parquet`` over
pandas-default tz-naive files yields TIMESTAMP_NTZ, which bare
``F.unix_micros`` rejects with DATATYPE_MISMATCH.

``epoch_us`` casts to ``timestamp`` first: a no-op Catalyst elides for
LTZ inputs (no extra expression in the optimized plan), and for NTZ
inputs the wall-clock is interpreted in the session zone (UTC) — the
same instant DuckDB's naive reading of the identical file produces, so
oracle comparisons stay exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Exact integer microseconds since the epoch, tolerant of
    TIMESTAMP_NTZ, DATE, and string inputs (all cast through
    TimestampType under the session zone)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))

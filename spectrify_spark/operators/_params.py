"""Small driver-side parameter tables as Arrow-backed LocalRelations.

``spark.createDataFrame(list_of_rows, schema)`` routes tiny parameter
tables (centroid matrices, PQ codebooks, ADC LUTs, SQ min/max models,
query batches) through ``sc.parallelize``, so the frame is an
RDD-backed scan with ``defaultParallelism`` partitions: every broadcast
build of a ONE-ROW table schedules a 32-task stage on this host — and
at cluster scale a full executor round trip — per consuming action.
Routing the same rows through pandas + Arrow yields a ``LocalRelation``
the broadcast collects driver-side (measured 32-task stage -> 1 task;
guide §1.2: don't launch a distributed pass to read a constant).

Values are unchanged: the parameter tables carry doubles, ints and
strings (exact under Arrow), and the explicit schema is applied either
way.  Any conversion failure falls back to the classic path, so this is
a pure physical-plan optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def local_rows_frame(spark, rows, schema: str) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` that prefers the
    Arrow/pandas LocalRelation path (zero cluster tasks per broadcast
    build) over the parallelize path.  ``rows`` is a list of tuples;
    ``schema`` a DDL string."""
    try:
        import pandas as pd
        from pyspark.sql.types import _parse_datatype_string

        struct = _parse_datatype_string(schema)
        names = [f.name for f in struct.fields]
        pdf = pd.DataFrame(list(rows), columns=names, dtype=object)
        df = spark.createDataFrame(pdf, struct)
        # the win only exists on the Arrow path (LocalTableScan); a
        # silent fallback inside createDataFrame would still be
        # correct, so accept whatever plan it produced
        return df
    except Exception:  # noqa: BLE001 — conversion quirk: keep the classic path
        return spark.createDataFrame(list(rows), schema)

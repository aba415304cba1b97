"""spectrify_spark — a PySpark-native engine with the capabilities of
hellonarrativ/spectrify (reference surveyed in SURVEY.md), re-expressed
Spark-first, plus the relational query surface the reference's pipeline
exists to enable and large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Layout
------
- ``session``    SparkSession factory (Arrow, AQE, UTC, INT96 parquet).
- ``types``      Redshift/SQL type name <-> Spark type map + whitelist
                 validation (parity: reference spectrify/utils/schema.py:38-44,
                 spectrify/utils/parquet.py:24-40).
- ``sources``    gzip pipe-CSV reader/writer + UNLOAD-style manifest,
                 JDBC export wrapper, parquet sink (reference export.py,
                 convert.py, utils/s3.py — Spark-native, no port).
- ``catalog``    external-table DDL emitters (reference create.py).
- ``transform``  3-stage pipeline composition (reference transform.py).
- ``operators``  relational + extension operators as DataFrame->DataFrame
                 functions (compose at 100 TB: no collect, no driver state).
- ``functions``  column-expression helpers (casts, text, vectors).
- ``multimodal`` opaque binary columns + Pandas-UDF decode plumbing.
- ``streaming``  Structured Streaming twins of the event-time operators.
"""

__version__ = "0.1.0"

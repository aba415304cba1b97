from spectrify_spark.sources import csv, jdbc, manifest, parquet  # noqa: F401

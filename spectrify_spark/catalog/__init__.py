from spectrify_spark.catalog import ddl  # noqa: F401

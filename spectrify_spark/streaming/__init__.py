from spectrify_spark.streaming import events  # noqa: F401

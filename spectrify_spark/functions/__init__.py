from spectrify_spark.functions import casts, text, vectors  # noqa: F401

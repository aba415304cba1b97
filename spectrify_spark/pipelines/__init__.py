from spectrify_spark.pipelines.training_data import curate, curate_chunks  # noqa: F401

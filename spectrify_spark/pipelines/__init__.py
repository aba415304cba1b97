from spectrify_spark.pipelines.training_data import curate  # noqa: F401

from spectrify_spark.operators import (  # noqa: F401
    dedup,
    relational,
    sessionize,
    similarity,
)

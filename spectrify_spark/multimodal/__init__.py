from spectrify_spark.multimodal.binary_cols import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_images,
    extract_features,
    fake_decode_batch,
    media_metadata,
    resize_images,
    sample_frames,
)

from spectrify_spark.multimodal.binary_cols import (  # noqa: F401
    MEDIA_SCHEMA,
    audio_features,
    decode_images,
    decode_images_arrow,
    extract_features,
    fake_decode_batch,
    media_metadata,
    real_decode_batch,
    resize_images,
    sample_frames,
    video_frame_features,
)

from emap_spark.multimodal.binary_ops import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    frame_sample,
    media_metadata,
    synthetic_media,
)

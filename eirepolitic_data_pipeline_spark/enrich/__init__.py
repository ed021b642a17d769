from .llm import LLMColumnConfig, LLMColumnRunner  # noqa: F401
from .multimodal import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_image_features,
    media_metadata,
    sample_video_frames,
)

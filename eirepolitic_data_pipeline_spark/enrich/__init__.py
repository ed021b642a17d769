from .batch_scoring import (  # noqa: F401
    BatchScoreConfig,
    BatchScoreRunner,
    build_scoring_prompt,
    extract_json_payload,
    parse_scores,
)
from .llm import LLMColumnConfig, LLMColumnRunner  # noqa: F401
from .scrape import (  # noqa: F401
    extract_photo_url,
    scrape_photo_urls,
    to_public_profile_url,
)
from .multimodal import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_image_features,
    media_metadata,
    sample_video_frames,
)

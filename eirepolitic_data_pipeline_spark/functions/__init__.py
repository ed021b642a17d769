from .scalar import (  # noqa: F401
    blank_as_null,
    coalesce_nonblank,
    is_current_range,
    nonblank,
    normalize_name,
    parse_iso_date,
    safe_text,
    slugify,
    snake_case,
    stable_hash,
    stable_record_hash,
    truthy,
    word_count,
)
from .text import (  # noqa: F401
    char_ngrams,
    doc_fingerprint,
    language_guess,
    quality_features,
    token_count,
    tokens,
    word_shingles,
)

from .scalar import (  # noqa: F401
    blank_as_null,
    coalesce_nonblank,
    int_or_2dp,
    is_current_range,
    nonblank,
    ordinal_rank,
    percent_string,
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
from .urls import (  # noqa: F401
    canonical_url,
    registered_domain,
    url_host,
)

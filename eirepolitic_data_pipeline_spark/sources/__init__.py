from .rest import (  # noqa: F401
    OffsetCeilingError,
    PageProgressError,
    PaginatedRestSource,
    RetryPolicy,
    bisect_date_windows,
    endpoint_discovery,
    fetch_date_partitioned,
    fetch_with_fallback,
)
from .files import (  # noqa: F401
    archive_raw_payload,
    clean_column_name,
    fetch_documents,
    list_binary_files,
    normalize_column_names,
    read_csv_blank_preserving,
    write_csv_export,
)
from .xml import parse_debate_xml, speeches_from_xml  # noqa: F401

from .rest import (  # noqa: F401
    OffsetCeilingError,
    PageProgressError,
    PaginatedRestSource,
    RetryPolicy,
    bisect_date_windows,
    fetch_date_partitioned,
)
from .xml import parse_debate_xml, speeches_from_xml  # noqa: F401

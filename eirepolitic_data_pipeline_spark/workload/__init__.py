"""Query workload registry: every operator family from SURVEY.md §2 expressed
as a (PySpark DataFrame builder, DuckDB oracle SQL) pair over the driver's
test star schema.

The driver's correctness gate runs each Spark query and its oracle SQL
side-by-side and hash-compares results (order-insensitive, columns sorted by
name) — so every computed column is aliased identically on both sides, dates
are emitted as ISO strings, and floating aggregates are rounded to a fixed
number of decimals to absorb summation-order drift.
"""

from __future__ import annotations

from .registry import QUERIES, Query, register  # noqa: F401
from . import core  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import datapipe  # noqa: F401,E402
from . import quality  # noqa: F401,E402
from . import marts  # noqa: F401,E402


def queries():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql():
    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}

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

import functools

from .registry import QUERIES, Query, register, tune_session  # noqa: F401

# Registration order == the order the driver's correctness gate runs (and may
# budget-truncate) the workload. The flagship gold marts register right after
# the core relational block so they are never the entries at risk; the cheap
# scalar-parity/DQ block runs last.
from . import core  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import marts  # noqa: F401,E402
from . import datapipe  # noqa: F401,E402
from . import quality  # noqa: F401,E402


def _tuned(fn):
    """Wrap a query builder so it first applies the engine's runtime SQL
    confs to whatever session the harness hands us (see registry.tune_session)."""
    @functools.wraps(fn)
    def run(spark, sf_dir):
        return fn(tune_session(spark), sf_dir)
    return run


def queries():
    return {name: _tuned(q.fn) for name, q in QUERIES.items()}


def oracle_sql():
    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}

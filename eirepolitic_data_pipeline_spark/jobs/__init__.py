"""Orchestration jobs — refresh input normalization and batch lifecycle."""

from .refresh import (  # noqa: F401
    DEFAULT_MODES,
    DEFAULT_TABLES,
    RefreshInputs,
    default_window,
    normalize_refresh_inputs,
    order_control_tables_last,
)

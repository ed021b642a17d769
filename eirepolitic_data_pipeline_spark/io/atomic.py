"""Crash-safe directory replacement shared by every in-place rewrite
(catalog candidate swaps, column deletes, compaction).

Protocol (single writer per path; concurrent writers to one dataset are
out of contract everywhere in this engine):

1. heal: if a previous swap died between its two renames, the only copy of
   the data sits at ``path.__replaced`` — rename it back before anything
   else runs, so the stranded dir is never mistaken for garbage;
2. the caller writes the replacement into ``path.__incoming``;
3. swap: rename ``path`` → ``path.__replaced``, rename ``.__incoming`` →
   ``path``, delete ``.__replaced``. A crash at any point leaves either
   the old data live at ``path`` or recoverable at the FIXED ``.__replaced``
   suffix (random-suffix backups are unrecoverable by construction — no
   later run can tell them from garbage).

On a rename-less object store the swap step becomes a manifest/pointer
update instead (cf. BatchCatalog.promote); this module is the
filesystem-backed implementation.
"""

from __future__ import annotations

import os
import shutil

INCOMING_SUFFIX = ".__incoming"
REPLACED_SUFFIX = ".__replaced"


def heal_interrupted_swap(path: str) -> bool:
    """Restore a dataset stranded mid-swap at ``path.__replaced``.
    Returns True if a recovery happened. Writer-side only: a reader must
    NOT heal, or it races an in-flight swap (see swap_in docstring)."""
    old = path + REPLACED_SUFFIX
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)
        return True
    return False


def incoming_path(path: str) -> str:
    """Where the replacement must be written before ``swap_in``. Heals and
    clears stale siblings first (both deletable only because ``path`` is
    live after healing — see module protocol)."""
    heal_interrupted_swap(path)
    for stale in (path + INCOMING_SUFFIX, path + REPLACED_SUFFIX):
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    return path + INCOMING_SUFFIX


def swap_in(path: str) -> None:
    """Commit ``path.__incoming`` over ``path`` with two renames; the old
    data survives at the fixed ``.__replaced`` suffix until the new write
    is fully live.

    The incoming dir must EXIST before the live data is renamed away —
    swapping with a missing/failed incoming write would take the dataset
    offline (sole copy parked at ``.__replaced``) until the next
    writer-side heal."""
    tmp, old = path + INCOMING_SUFFIX, path + REPLACED_SUFFIX
    if not os.path.isdir(tmp):
        raise FileNotFoundError(
            f"swap_in: incoming dir {tmp!r} does not exist — write the "
            "replacement there first (incoming_path)")
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)

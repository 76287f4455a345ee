"""Persist-tracking for operator-internal cached intermediates.

Several operators persist exploded intermediate frames (band/gram tables)
because the cap filter and both self-join sides consume them; the frames are
internal, so callers can't unpersist them by reference. Operators register
each persist here; long-lived sessions (the pipeline after a stage
materializes, a service between registry runs) call ``release_tracked()`` to
unpersist the backlog. Unpersisting is always safe — a later action merely
recomputes — so eager release never affects correctness, only warmth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist df and remember it for a later bulk release."""
    _TRACKED.append(df.persist())
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame. Returns the number released."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
        released += 1
    return released

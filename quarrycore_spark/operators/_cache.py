"""Persist-tracking for operator-internal cached intermediates.

Several operators persist exploded intermediate frames (band/gram tables)
because the cap filter and both self-join sides consume them; the frames are
internal, so callers can't unpersist them by reference. Operators register
each persist here; long-lived sessions (the pipeline after a stage
materializes, a service between registry runs) call ``release_tracked()`` to
unpersist the backlog. Unpersisting is always safe — a later action merely
recomputes — so eager release never affects correctness, only warmth.

Tracked frames are keyed by the owning SparkSession's applicationId (same
discipline as plans/registry._SIG_CACHE): ``release_tracked()`` called from
one session cannot unpersist frames a concurrently running pipeline in
another session still needs, and a stopped application's entries are
dropped rather than accumulating.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession

_TRACKED: dict[str, list[DataFrame]] = defaultdict(list)


def _app_id(df_or_spark) -> str:
    spark = (
        df_or_spark
        if isinstance(df_or_spark, SparkSession)
        else df_or_spark.sparkSession
    )
    return spark.sparkContext.applicationId


def track(df: DataFrame) -> DataFrame:
    """Persist df and remember it for a later bulk release."""
    _TRACKED[_app_id(df)].append(df.persist())
    return df


def release_tracked(spark: SparkSession | None = None) -> int:
    """Unpersist every frame tracked for the given session (the active
    session's application when omitted). Returns the number released."""
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is None:  # no live session: drop all bookkeeping
        n = sum(len(v) for v in _TRACKED.values())
        _TRACKED.clear()
        return n
    try:
        key = _app_id(spark)
    except Exception:  # session stopped mid-call
        _TRACKED.clear()
        return 0
    released = 0
    frames = _TRACKED.pop(key, [])
    for df in frames:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
        released += 1
    return released

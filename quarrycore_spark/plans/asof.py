"""As-of join over the `events` table, as a paired Spark/DuckDB query.

The classic temporal operator Spark has no built-in for (graft
addition; reference analytics stop at sessionization): for each
`purchase` event, attribute the most recent strictly-prior `click`
by the same user and report the elapsed milliseconds — the
last-touch-attribution / merge-asof shape.

Spark shape at 100 TB: the scalable as-of is NOT a range join (which
explodes to O(pairs-in-window) before pruning) but a single
partitioned merge: union both event roles in one pass, shuffle once on
`user_id`, sort within the partition by (ts, event_id), and carry the
last non-null source timestamp forward with `last_value(..., true)`
over ROWS UNBOUNDED PRECEDING .. 1 PRECEDING. One exchange, one
in-partition sort, zero joins; per-user streams of any length flow
through without materializing candidate pairs. (DuckDB spells the
same window `last_value(x IGNORE NULLS)` — and its native ASOF JOIN
would also work, but the oracle stays ANSI.)

Integer contract: timestamps compare as epoch milliseconds
(`unix_millis` / `epoch_ms`, both exact BIGINT); unattributed
purchases (no prior click) report ms_since_click = -1, attributed = 0.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans.registry import Query, register

SOURCE_TYPE = "click"
TARGET_TYPE = "purchase"


def _event_attribution_sql(dialect: str) -> str:
    if dialect == SPARK:
        # events.ts parses as TIMESTAMP_NTZ; the session timezone is
        # pinned UTC, so casting matches DuckDB's naive epoch_ms exactly
        # (same idiom as textops.py event_sessions).
        ms = "unix_millis(cast(ts as timestamp))"
        carry = "last_value(src_ms, true)"
    else:
        ms = "epoch_ms(ts)"
        carry = "last_value(src_ms IGNORE NULLS)"
    return f"""
WITH _m AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN event_type = '{SOURCE_TYPE}' THEN {ms} END AS src_ms,
         {ms} AS ts_ms
  FROM events),
_w AS (
  SELECT event_id, user_id, event_type, ts_ms,
         {carry} OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS last_src_ms
  FROM _m)
SELECT event_id, user_id,
       cast(coalesce(ts_ms - last_src_ms, -1) as bigint) AS ms_since_click,
       cast(CASE WHEN last_src_ms IS NULL THEN 0 ELSE 1 END as int)
           AS attributed
FROM _w
WHERE event_type = '{TARGET_TYPE}'
"""


register(
    Query(
        "event_attribution",
        "As-of join (last-touch attribution): for each purchase, the "
        "most recent strictly-prior click of the same user — one "
        "user_id exchange + in-partition sort + IGNORE-NULLS carry, "
        "no range-join pair explosion",
        _event_attribution_sql,
        tables=("events",),
    )
)


# Range join: count source events inside a bounded look-back window of
# each target event. The naive form is a band self-join
# (e.ts BETWEEN t.ts - W AND t.ts), which explodes to every in-window
# pair before aggregating; the scalable form below is the same single
# user_id exchange + in-partition sort as the as-of, with a numeric
# RANGE frame doing the windowed count in one pass.
# 24 h: the synthetic corpus keeps per-user event density constant
# across sf (~67 events/user over 30 days), so a day-wide look-back
# demonstrably fires (~35% of purchases) at every sf.
RANGE_WINDOW_MS = 86_400_000


def _event_rate_window_sql(dialect: str) -> str:
    ms = ("unix_millis(cast(ts as timestamp))" if dialect == SPARK
          else "epoch_ms(ts)")
    return f"""
WITH _m AS (
  SELECT event_id, user_id, event_type, {ms} AS ts_ms FROM events),
_w AS (
  SELECT event_id, user_id, event_type, ts_ms,
         sum(CASE WHEN event_type = '{SOURCE_TYPE}' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts_ms
                   RANGE BETWEEN {RANGE_WINDOW_MS} PRECEDING
                             AND 1 PRECEDING) AS n_src
  FROM _m)
SELECT event_id, user_id,
       cast(coalesce(n_src, 0) as int) AS clicks_in_window
FROM _w
WHERE event_type = '{TARGET_TYPE}'
"""


register(
    Query(
        "event_rate_window",
        "Range join (bounded look-back count): clicks by the same user "
        "in the 24 hours before each purchase — numeric RANGE frame on "
        "the single user_id exchange, no band-join pair explosion",
        _event_rate_window_sql,
        tables=("events",),
    )
)

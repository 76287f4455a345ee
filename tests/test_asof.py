"""As-of join / last-touch attribution (plans/asof.py): a pure-Python
merge-asof simulation pinned against the DuckDB dialect of the
registered query. Spark-vs-DuckDB parity over the real sf0.01 corpus
is covered by test_oracle_parity's registry sweep."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd

from quarrycore_spark.functions.dialect import DUCKDB
from quarrycore_spark.plans.asof import (
    RANGE_WINDOW_MS,
    SOURCE_TYPE,
    TARGET_TYPE,
    _event_attribution_sql,
    _event_rate_window_sql,
)

T0 = dt.datetime(2024, 1, 1)


def ev(event_id: int, ms: int, user_id: int, event_type: str) -> dict:
    return {
        "event_id": event_id,
        "ts": T0 + dt.timedelta(milliseconds=ms),
        "user_id": user_id,
        "event_type": event_type,
    }


def run_duck(rows: list[dict]) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("events", pd.DataFrame(rows))
    return (
        con.sql(_event_attribution_sql(DUCKDB))
        .fetchdf()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def ref_attribution(rows: list[dict]) -> dict[int, tuple[int, int]]:
    """Per purchase event: (ms_since_click, attributed) via an explicit
    per-user merge scan ordered by (ts, event_id)."""
    out = {}
    df = pd.DataFrame(rows).sort_values(["user_id", "ts", "event_id"])
    for _, g in df.groupby("user_id"):
        last_ms = None
        for _, r in g.iterrows():
            ms = int(r["ts"].timestamp() * 1000)
            if r["event_type"] == TARGET_TYPE:
                out[r["event_id"]] = (
                    (-1, 0) if last_ms is None else (ms - last_ms, 1)
                )
            if r["event_type"] == SOURCE_TYPE:
                last_ms = ms
    return out


def check(rows: list[dict]) -> pd.DataFrame:
    got = run_duck(rows)
    exp = ref_attribution(rows)
    assert set(got["event_id"]) == set(exp)
    for _, r in got.iterrows():
        assert (r["ms_since_click"], r["attributed"]) == exp[r["event_id"]], (
            r["event_id"],
            dict(r),
            exp[r["event_id"]],
        )
    return got


def test_basic_attribution_and_unattributed():
    rows = [
        ev(0, 0, 1, "click"),
        ev(1, 500, 1, "purchase"),     # 500 ms after click
        ev(2, 600, 1, "purchase"),     # still the same click: 600 ms
        ev(3, 100, 2, "purchase"),     # user 2 never clicked
        ev(4, 1000, 1, "click"),
        ev(5, 1001, 1, "purchase"),    # newest click wins: 1 ms
    ]
    got = check(rows).set_index("event_id")
    assert got.loc[1, "ms_since_click"] == 500
    assert got.loc[2, "ms_since_click"] == 600
    assert got.loc[3, "ms_since_click"] == -1
    assert got.loc[3, "attributed"] == 0
    assert got.loc[5, "ms_since_click"] == 1


def test_strictly_prior_tie_breaks_by_event_id():
    """A click at the SAME timestamp counts only if its event_id sorts
    before the purchase (ROWS .. 1 PRECEDING is positional)."""
    rows = [
        ev(10, 100, 1, "click"),      # same ts, lower id -> counts
        ev(11, 100, 1, "purchase"),
        ev(21, 200, 2, "purchase"),   # same ts, click id higher -> not prior
        ev(22, 200, 2, "click"),
    ]
    got = check(rows).set_index("event_id")
    assert got.loc[11, "ms_since_click"] == 0
    assert got.loc[11, "attributed"] == 1
    assert got.loc[21, "attributed"] == 0


def test_other_event_types_are_transparent():
    rows = [
        ev(0, 0, 1, "click"),
        ev(1, 10, 1, "view"),
        ev(2, 20, 1, "error"),
        ev(3, 30, 1, "purchase"),
    ]
    got = check(rows).set_index("event_id")
    assert set(got.index) == {3}
    assert got.loc[3, "ms_since_click"] == 30


def test_users_are_isolated():
    rows = [
        ev(0, 0, 1, "click"),
        ev(1, 50, 2, "purchase"),  # user 2 must not see user 1's click
    ]
    got = check(rows).set_index("event_id")
    assert got.loc[1, "attributed"] == 0


def run_duck_range(rows: list[dict]) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("events", pd.DataFrame(rows))
    return (
        con.sql(_event_rate_window_sql(DUCKDB))
        .fetchdf()
        .sort_values("event_id")
        .set_index("event_id")
    )


def test_range_window_counts_and_bounds():
    w = RANGE_WINDOW_MS
    rows = [
        ev(0, 0, 1, "click"),
        ev(1, w, 1, "purchase"),        # click exactly w ms before: IN
        ev(2, w + 1, 1, "purchase"),    # click now w+1 ms before: OUT
        ev(3, w + 1, 1, "click"),       # same-ms click is NOT prior (RANGE
        ev(4, w + 1, 1, "purchase"),    # peers excluded by 1 PRECEDING)
        ev(5, w + 2, 1, "purchase"),    # now it is prior: 1
        ev(6, 0, 2, "purchase"),        # user 2: nothing
    ]
    got = run_duck_range(rows)
    assert got.loc[1, "clicks_in_window"] == 1
    assert got.loc[2, "clicks_in_window"] == 0
    assert got.loc[4, "clicks_in_window"] == 0
    assert got.loc[5, "clicks_in_window"] == 1
    assert got.loc[6, "clicks_in_window"] == 0


def test_range_window_accumulates_multiple_clicks():
    rows = [ev(i, i * 10, 1, "click") for i in range(5)]
    rows.append(ev(99, 60, 1, "purchase"))
    got = run_duck_range(rows)
    assert got.loc[99, "clicks_in_window"] == 5


def test_real_corpus_slice_matches_reference():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_id, ts, user_id, event_type "
        "FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchdf()
    # epoch-ms-exact fixture: truncate ts to whole ms so the python
    # reference's int(ts*1000) equals the engines' epoch_ms truncation
    rows["ts"] = rows["ts"].dt.floor("ms")
    check(rows.to_dict("records"))

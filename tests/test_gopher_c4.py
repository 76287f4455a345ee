"""Non-vacuity tests for the Gopher rule-A/B and C4 cleaning censuses.

Oracle parity (test_oracle_parity.py) proves Spark == DuckDB; these
tests prove the rules actually FIRE — every flag must be observed in
both states at sf0.001, otherwise the planted augmentation regressed
and the value hash is vacuous.
"""

from __future__ import annotations

from quarrycore_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE

GOPHER_FLAGS = (
    "word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
    "bullet_ratio_ok", "ellipsis_ratio_ok", "alpha_ratio_ok",
    "stopwords_ok",
)


def test_gopher_flags_fire_both_ways(spark):
    rows = [
        r.asDict()
        for r in REGISTRY["gopher_quality_flags"].run_spark(spark, SF_SMOKE).collect()
    ]
    assert rows
    for flag in GOPHER_FLAGS:
        vals = {r[flag] for r in rows}
        assert vals == {0, 1}, f"{flag} never fired both ways: {vals}"
    passes = {r["gopher_pass"] for r in rows}
    assert passes == {0, 1}
    # gopher_pass is exactly the AND of the per-rule flags.
    for r in rows:
        expect = 1 if all(r[f] == 1 for f in GOPHER_FLAGS) else 0
        assert r["gopher_pass"] == expect
    # Milli-ratios stay in sane integer ranges.
    for r in rows:
        for c in ("symbol_milli", "bullet_milli", "ellipsis_milli",
                  "alpha_milli"):
            assert 0 <= r[c] <= 1000, (c, r[c])
        assert r["mean_word_len_milli"] >= 1000  # >= 1 char/word


def test_c4_counts_fire_both_ways(spark):
    rows = [
        r.asDict()
        for r in REGISTRY["c4_line_filter"].run_spark(spark, SF_SMOKE).collect()
    ]
    assert rows
    for col in ("has_brace", "has_lorem", "c4_keep"):
        assert {r[col] for r in rows} == {0, 1}, col
    assert any(r["n_js_lines"] > 0 for r in rows)
    assert any(r["n_js_lines"] == 0 for r in rows)
    assert any(r["n_short_lines"] > 0 for r in rows)
    for r in rows:
        # Internal consistency: kept lines are a subset of all lines,
        # and every non-terminal line is excluded from kept.
        assert 0 <= r["n_kept_lines"] <= r["n_terminal_lines"] <= r["n_lines"]
        assert r["kept_chars"] >= r["n_kept_lines"]  # non-empty lines
        keep = (
            r["n_kept_lines"] >= 3
            and r["has_brace"] == 0
            and r["has_lorem"] == 0
        )
        assert r["c4_keep"] == (1 if keep else 0)

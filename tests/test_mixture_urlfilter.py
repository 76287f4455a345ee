"""source_token_budget and url_blocklist_filter: conservation laws,
closed-form truth, and the zero/one-shuffle plan shapes."""

from __future__ import annotations

from quarrycore_spark.plans.registry import REGISTRY
from quarrycore_spark.plans.urlfilter import (
    BLOCKED_DOMAINS,
    BLOCKED_KEYWORDS,
    PATH_SECTIONS,
)
from tests.conftest import SF_SMOKE


def test_source_budget_conservation(spark):
    rows = [
        r.asDict()
        for r in REGISTRY["source_token_budget"].run_spark(spark, SF_SMOKE).collect()
    ]
    assert rows
    total_tokens = sum(r["tokens"] for r in rows)
    n_sources = len(rows)
    for r in rows:
        assert r["share_milli"] == r["tokens"] * 1000 // total_tokens
        assert r["weight_milli"] == 1000 * total_tokens // (
            n_sources * r["tokens"]
        )
    # Floor division undershoots: shares sum to <= 1000, close to it.
    s = sum(r["share_milli"] for r in rows)
    assert 1000 - n_sources <= s <= 1000
    # Uniform target: over- and under-represented sources both exist
    # unless the mix is exactly uniform.
    if any(r["share_milli"] != rows[0]["share_milli"] for r in rows):
        assert any(r["weight_milli"] > 1000 for r in rows)
        assert any(r["weight_milli"] < 1000 for r in rows)


def test_url_filter_closed_form(spark):
    rows = [
        r.asDict()
        for r in REGISTRY["url_blocklist_filter"].run_spark(spark, SF_SMOKE).collect()
    ]
    assert rows
    seen_reasons = set()
    for r in rows:
        j = r["doc_id"] // 2
        section = PATH_SECTIONS[j % len(PATH_SECTIONS)]
        host = f"site{j % 7}.example.com"
        assert r["host"] == host
        want_domain = 1 if host in BLOCKED_DOMAINS else 0
        want_keyword = 1 if section in BLOCKED_KEYWORDS else 0
        assert r["domain_blocked"] == want_domain
        assert r["keyword_blocked"] == want_keyword
        if want_domain:
            assert r["block_reason"] == "domain"  # precedence
        elif want_keyword:
            assert r["block_reason"] == "keyword"
        else:
            assert r["block_reason"] == "none"
        assert r["allowed"] == (0 if (want_domain or want_keyword) else 1)
        seen_reasons.add(r["block_reason"])
    assert seen_reasons == {"domain", "keyword", "none"}


def test_plan_shapes(spark):
    plan = (
        REGISTRY["url_blocklist_filter"]
        .run_spark(spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure projection
    assert "Join" not in plan
    plan2 = (
        REGISTRY["source_token_budget"]
        .run_spark(spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one source agg (two-phase = one exchange) + the one-row totals side
    assert plan2.count("Exchange hashpartitioning") <= 2
    assert "BroadcastNestedLoopJoin" in plan2 or "BroadcastExchange" in plan2

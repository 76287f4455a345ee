"""url_revisions: churn-class truth, latest-pick determinism, and the
one-exchange plan shape."""

from __future__ import annotations

from quarrycore_spark.plans.crawlops import CRAWLS_PER_URL, TS_BASE
from quarrycore_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE


def _rows(spark):
    return [
        r.asDict()
        for r in REGISTRY["url_revisions"].run_spark(spark, SF_SMOKE).collect()
    ]


def test_churn_classes_match_closed_form(spark):
    rows = _rows(spark)
    assert rows
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    by_url = {r["url"]: r for r in rows}
    # Rebuild the expected census from the closed form and compare.
    from collections import defaultdict

    crawls = defaultdict(list)
    for doc_id in range(n_docs):
        j, c = divmod(doc_id, CRAWLS_PER_URL)
        url = f"https://site{j % 7}.example.com/post-{j}"
        if j % 3 == 0:
            v = c
        elif j % 3 == 1:
            v = 0
        else:
            v = 0 if c == 0 else 1
        crawls[url].append((doc_id, TS_BASE + j * 1000 + c * 100, v))
    assert set(by_url) == set(crawls)
    for url, visits in crawls.items():
        r = by_url[url]
        assert r["n_crawls"] == len(visits)
        assert r["n_versions"] == len({v for _, _, v in visits})
        assert r["changed"] == (1 if r["n_versions"] > 1 else 0)
        latest = max(visits, key=lambda t: t[1])
        assert r["latest_doc_id"] == latest[0]
        assert r["latest_ts"] == latest[1]
        ts = [t for _, t, _ in visits]
        assert r["span_s"] == max(ts) - min(ts)


def test_all_three_churn_classes_observed(spark):
    rows = _rows(spark)
    assert {r["n_versions"] for r in rows} >= {1, 2, 3}
    assert {r["changed"] for r in rows} == {0, 1}


def test_agg_only_plan(spark):
    df = REGISTRY["url_revisions"].run_spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the two-phase distinct-agg shape: partial (url, chash) dedup
    # map-side, exchange on (url, chash), then the url rollup exchange —
    # and nothing else (no join, no extra shuffle, pruned scan).
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Join" not in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_cdx_index_surt_and_timestamp(spark):
    import re
    from datetime import datetime, timezone

    rows = [
        r.asDict()
        for r in REGISTRY["cdx_index"].run_spark(spark, SF_SMOKE).collect()
    ]
    assert rows
    for r in rows:
        j = r["doc_id"] // CRAWLS_PER_URL
        c = r["doc_id"] % CRAWLS_PER_URL
        # SURT: reversed host components, ')' separator, then the path.
        assert r["surt_key"] == f"com,example,site{j % 7})/post-{j}"
        assert re.fullmatch(r"\d{14}", r["ts14"])
        epoch = TS_BASE + j * 1000 + c * 100
        want = datetime.fromtimestamp(epoch, tz=timezone.utc).strftime(
            "%Y%m%d%H%M%S"
        )
        assert r["ts14"] == want
        assert re.fullmatch(r"[0-9a-f]{16}", r["digest16"])
    # the SURT property: one domain's captures sort contiguously
    ordered = sorted(rows, key=lambda r: r["surt_key"])
    hosts = [r["surt_key"].split(")")[0] for r in ordered]
    seen, prev = set(), None
    for h in hosts:
        if h != prev:
            assert h not in seen  # a host never reappears after a gap
            seen.add(h)
            prev = h
